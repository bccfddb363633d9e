package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based-optimizer demonstration (the one Catalyst layer PLANS.md
  * didn't yet exercise): ANALYZE-collected statistics must CHANGE a plan.
  *
  * Setup: lineitem at sf0.01 is ~1 MB on disk; `l_quantity <= 2` keeps
  * ~3.9% of rows. With the broadcast threshold pinned at 256 KB:
  *
  *   - no stats → the filtered side is estimated at FILE size (~1 MB),
  *     above threshold on both sides → SortMergeJoin;
  *   - ANALYZE row + column stats, CBO on → FilterEstimation shrinks the
  *     side to ~4% via the l_quantity min/max/ndv → BroadcastHashJoin;
  *   - same stats, CBO off → size-only estimation ignores the predicate
  *     → SortMergeJoin again, pinning that the flip is genuinely
  *     cost-based, not a side effect of ANALYZE's size refresh.
  *
  * This is the spec counterpart of q92's one-scan stats collector: q92
  * computes ANALYZE's numbers as a query; this pins what the numbers DO. */
class CboSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kv.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach { case (k, o) =>
      o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("ANALYZE statistics flip the selective join side to broadcast — and only under CBO") {
    spark.sql("DROP TABLE IF EXISTS cbo_lineitem")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.mode("overwrite").saveAsTable("cbo_lineitem")
    try {
      withConfs(
        // AQE off: this pins the STATIC cost-based decision; AQE's
        // runtime size rescue is AqeSpec's subject, not CBO's.
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.cbo.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "262144") {
        def plan: String = {
          // No projections anywhere: column pruning discounts the scan's
          // size estimate by read-schema width, which would sink the
          // no-stats side below the threshold on its own and mask the
          // CBO effect this spec exists to pin.
          val big = spark.read.parquet(s"$sf/lineitem.parquet")
          spark.table("cbo_lineitem")
            .filter(col("l_quantity") <= 2)
            .join(big, "l_orderkey")
            .queryExecution.sparkPlan.toString
        }
        assert(plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
          s"without stats, the file-size estimate (~1 MB) must exceed the 256 KB threshold:\n$plan")

        spark.sql("ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS")
        spark.sql("ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS FOR COLUMNS l_quantity")
        assert(plan.contains("BroadcastHashJoin"),
          s"with row + l_quantity column stats, the ~4% filter estimate must broadcast:\n$plan")

        spark.conf.set("spark.sql.cbo.enabled", "false")
        assert(plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
          s"size-only estimation must ignore the predicate — the flip has to be CBO's doing:\n$plan")
      }
    } finally spark.sql("DROP TABLE IF EXISTS cbo_lineitem")
  }
}
