package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.ParityPlusQueries

/** The whole point of q40: a join of two tables bucketed on the join key
  * must plan with no exchange feeding the join — the only shuffle left is
  * the downstream aggregate on a different key. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bucketed-bucketed join plans without a join-side shuffle") {
    // Force the sort-merge path (at tiny sf the dim would auto-broadcast,
    // which also avoids the shuffle but hides what bucketing buys).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = ParityPlusQueries.q40BucketedJoin(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, plan:\n$plan")
      // no shuffle on either join key: bucketing already co-locates them
      assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
        !plan.contains("Exchange hashpartitioning(c_custkey"),
        s"expected no join-key shuffle, plan:\n$plan")
      assert(plan.contains("Bucketed: true"))
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
