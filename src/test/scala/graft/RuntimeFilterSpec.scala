package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The third layer of the join-pruning story, after broadcast dims and
  * AQE re-planning: RUNTIME FILTERS. When a selective dimension joins a
  * large fact on a non-partition key, Spark can build a Bloom filter
  * over the dim's join keys at runtime and push `might_contain` into
  * the fact scan — rows that cannot match never reach the shuffle. At
  * 100 TB this is the difference between shuffling the fact table and
  * shuffling the ~matching slice; this suite asserts the filter
  * actually injects and semantically changes nothing, using a child
  * session with the size thresholds scaled to fixture data (AqeSpec's
  * methodology).
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val base = SparkTestSession.spark

  private def rfSession(): SparkSession = {
    val s = base.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // Fixture-scaled thresholds: the dim (creation side) must look small
    // enough to build from, the fact scan big enough to be worth pruning.
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle join
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s
  }

  private def scratch(name: String): String =
    s"${sys.props("user.dir")}/target/etl/runtime_filter/$name"

  test("a selective dim join injects a Bloom runtime filter into the fact scan") {
    val s = rfSession()
    // Runtime filters apply to file relations with size estimates — write
    // the fixture-derived fact/dim to parquet first (the 100 TB shape).
    graft.sources.Tables(s, "/root/testdata/sf0.01", "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .write.mode("overwrite").parquet(scratch("fact"))
    graft.sources.Tables(s, "/root/testdata/sf0.01", "part")
      .select(col("p_partkey"), col("p_name"))
      .write.mode("overwrite").parquet(scratch("dim"))
    val fact = s.read.parquet(scratch("fact"))
    // The selective predicate must sit IN the query on the creation side:
    // InjectRuntimeFilter keys off a likely-selective filter above the
    // dim scan (that is what makes the Bloom filter worth building).
    val dim = s.read.parquet(scratch("dim"))
      .filter(col("p_partkey") % 40 === 0) // selective: ~2.5% of keys
    val joined = fact.join(dim, fact("l_partkey") === dim("p_partkey"))
    val n = joined.collect().length
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a Bloom runtime filter (might_contain) on the fact side:\n$plan")
    // Semantics unchanged: same count with the optimization disabled.
    val s2 = rfSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val plain = s2.read.parquet(scratch("fact"))
      .join(s2.read.parquet(scratch("dim"))
          .filter(col("p_partkey") % 40 === 0),
        col("l_partkey") === col("p_partkey"))
    assert(plain.collect().length == n,
      "runtime filter must not change the join result")
    assert(!plain.queryExecution.executedPlan.toString.contains("might_contain"),
      "control plan must not carry the filter")
  }
}
