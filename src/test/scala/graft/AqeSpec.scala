package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The engine's skew story is two-layered: deterministic salting where the
  * hot key is known (core.saltedJoin, core.asofJoinSalted — property-tested
  * equal to the unsalted ops) and AQE runtime re-planning for skew nobody
  * predicted. The salted layer is spec'd elsewhere; this suite turns the
  * "AQE handles the rest" claim into assertions — a skewed sort-merge join
  * gets its hot partition SPLIT at runtime, and a fine-grained shuffle gets
  * its small partitions COALESCED — using a child session with the AQE
  * thresholds scaled down to fixture size (the same knobs, different
  * magnitudes, that a 100 TB deployment tunes).
  */
class AqeSpec extends AnyFunSuite {
  private lazy val base = SparkTestSession.spark

  /** Child session: AQE on with tiny advisory sizes so fixture-scale data
    * crosses the same thresholds 100 TB data crosses in production. */
  private def aqeSession(): SparkSession = {
    val s = base.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s
  }

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true)") {
    val s = aqeSession()
    import s.implicits._
    // One hot key carrying ~100× the mass of the others: partition sizes
    // cross factor×median and the threshold, so OptimizeSkewedJoin must
    // split the hot partition into parallel sub-reads.
    // Cold keys derive from id/100 (the ids where id%100==0 are exactly
    // the multiples of 100, so `id % 50` would be constant 0 — the
    // round-9-flagged degenerate that left only two join keys).
    val left = s.range(0, 60000)
      .select(when(col("id") % 100 =!= 0, lit(1L))
        .otherwise((col("id") / 100).cast("long") % 50 + 2).as("k"),
        col("id").as("payload"))
    val right = s.range(0, 52).select(col("id").as("k"), (col("id") * 7).as("dim"))
    val joined = left.join(right, "k")
    // collect() drives THIS DataFrame's QueryExecution (count() would plan
    // a separate one, leaving this plan unexecuted and un-replanned).
    assert(joined.collect().length == 60000)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("SortMergeJoin") && finalPlan.contains("skew=true"),
      s"expected a runtime-split skewed SMJ, got:\n$finalPlan")
  }

  test("AQE coalesces undersized shuffle partitions (fewer reducers than configured)") {
    val s = aqeSession()
    // 8 configured shuffle partitions over a few KB of aggregate output:
    // the AQEShuffleRead must coalesce them below the static count.
    val tiny = s.range(0, 1000)
      .groupBy((col("id") % 7).as("k")).count()
    assert(tiny.collect().length == 7)
    val finalPlan = tiny.queryExecution.executedPlan.toString
    assert(finalPlan.contains("AQEShuffleRead coalesced"),
      s"expected a coalesced AQE shuffle read, got:\n$finalPlan")
  }
}
