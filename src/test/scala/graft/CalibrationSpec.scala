package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior pins for per-source quality calibration (q108): the
  * source-fairness property that is the operator's reason to exist, and
  * the shifted-distribution fixture showing why a raw threshold fails. */
class CalibrationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("a calibrated global cutoff keeps the same fraction of every source") {
    import spark.implicits._
    val kept = graft.queries.DocQueries.q108QualityCalibration(spark, sf)
      .groupBy("source")
      .agg(count(when(col("keep_fair"), 1)).as("kept"),
        count(lit(1)).as("total"))
      .as[(String, Long, Long)].collect()
    // The fixture's sources are equal-sized (25 docs each), so identical
    // acceptance FRACTIONS mean identical kept COUNTS.
    assert(kept.map(_._3).distinct.length == 1, "fixture changed shape")
    assert(kept.map(_._2).distinct.length == 1,
      s"calibrated cutoff must keep the same count per source: ${kept.toSeq}")
  }

  test("raw thresholds skew the mix; calibrated ones do not") {
    import spark.implicits._
    // Two sources with SHIFTED quality distributions: every generous-doc
    // outscores every strict-doc. A raw global threshold keeps 100% of
    // one and 0% of the other; the calibrated cutoff keeps half of each.
    val docs = ((1 to 20).map(i => (i.toLong, "generous", 0.8 + i * 0.001)) ++
      (21 to 40).map(i => (i.toLong, "strict", 0.3 + i * 0.001)))
      .toDF("doc_id", "source", "quality")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(asc("quality"), asc("doc_id"))
    val cal = docs.withColumn("cal", percent_rank().over(w))
    val rawKept = cal.filter(col("quality") >= 0.6)
      .groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(rawKept.getOrElse("generous", 0L) == 20L &&
      rawKept.getOrElse("strict", 0L) == 0L,
      s"the raw-threshold failure mode did not reproduce: $rawKept")
    val calKept = cal.filter(col("cal") >= 0.5)
      .groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(calKept("generous") == 10L && calKept("strict") == 10L,
      s"calibration must equalize acceptance: $calKept")
  }
}
