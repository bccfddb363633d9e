package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior pins for the filter cascade (q103): first-fail attribution,
  * the partition property that makes the per-rule counts a true census,
  * and threshold liveness on the fixture. */
class FilterCascadeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("a document failing several rules is attributed to the FIRST") {
    import spark.implicits._
    // doc 1 fails every rule; doc 2 only the later quality rule; doc 3
    // passes all. Attribution must follow cascade order, not severity.
    val docs = Seq(
      (1L, "en", 3L, 0.0, 0.1, 0.1),
      (2L, "en", 50L, 0.1, 0.9, 0.2),
      (3L, "en", 50L, 0.1, 0.9, 0.9))
      .toDF("doc_id", "lang", "n_tokens", "stop_ratio", "ttr", "quality")
    val out = graft.queries.DocQueries.filterCascade(docs, Seq(
      "too_short" -> (col("n_tokens") < 16),
      "low_stopword" -> (col("stop_ratio") < 0.015),
      "high_repetition" -> (col("ttr") < 0.32),
      "low_quality" -> (col("quality") < 0.62)))
      .select("verdict", "rule_idx", "n_docs")
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(("too_short", 1L, 1L), ("low_quality", 4L, 1L),
      ("kept", 5L, 1L)), s"got $out")
  }

  test("verdict counts partition the corpus per language") {
    import spark.implicits._
    val byLang = graft.sources.Tables(spark, sf, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val cascade = graft.queries.DocQueries.q103FilterCascade(spark, sf)
      .groupBy("lang").agg(sum("n_docs").as("n"))
      .as[(String, Long)].collect().toMap
    assert(cascade == byLang,
      s"first-fail attribution must partition the corpus: $cascade vs $byLang")
  }

  test("every rule fires on the fixture (thresholds are live)") {
    import spark.implicits._
    val verdicts = graft.queries.DocQueries.q103FilterCascade(spark, sf)
      .groupBy("verdict").agg(sum("n_docs").as("n"))
      .as[(String, Long)].collect().toMap
    val expected = Set("too_short", "low_stopword", "high_repetition",
      "low_quality", "kept")
    assert(verdicts.keySet == expected, s"dead rules: got ${verdicts.keySet}")
    assert(verdicts("kept") > 0)
  }
}
