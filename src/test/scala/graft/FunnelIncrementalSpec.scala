package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries
import graft.sources.Tables

/** q171 incremental curation funnel: the load-bearing property is
  * fold ≡ full-funnel — the delta-structured plan must reproduce q160's
  * census over snapshot B EXACTLY (that equality is why q171's
  * registered oracle is q160's CTE chain verbatim over B). Pinned on:
  *   1. the registered ~30%-touched delta (delete + edit + re-key);
  *   2. a sparse ~1‰ delta (the economics regime the operator exists
  *      for) and the EMPTY delta (B = A);
  *   3. planted snapshots forcing each incremental path the fold must
  *      get right: a dedup-KEEPER deletion (the hash group re-mins onto
  *      the survivor), a train-membership FLIP (deleting the only
  *      carrier of a contaminated doc's shingles must re-verdict that
  *      UNTOUCHED held-out doc to clean), and a gate-ENTRANT held-out
  *      doc (a length-distribution shift pulls a previously-ungated doc
  *      into scope — it has no stored verdict to inherit and must be
  *      verdicted fresh, here to contaminated). */
class FunnelIncrementalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def census(df: DataFrame): List[(String, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1))).toList

  private def doc(id: Long, src: String, text: String): (Long, String, String, String, Long) =
    (id, "en", src, text, text.length.toLong)

  private def frame(rows: Seq[(Long, String, String, String, Long)]): DataFrame =
    rows.toDF("doc_id", "lang", "source", "text", "n_chars")

  /** The q159/q165/q171 registered delta derivation over any corpus. */
  private def registeredDelta(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 10 =!= 3)
      .select(
        when(col("doc_id") % 10 === 7, col("doc_id") + 1000000000L)
          .otherwise(col("doc_id")).as("doc_id"),
        col("lang"), col("source"),
        when(col("doc_id") % 10 === 5, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"),
        when(col("doc_id") % 10 === 5, col("n_chars") + 5L)
          .otherwise(col("n_chars")).as("n_chars"))

  test("registered delta: fold ≡ full funnel over snapshot B") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val full = census(DocQueries.curationFunnel(registeredDelta(docs)))
    val fold = census(DocQueries.q171IncrementalCurationFunnel(
      spark, "/root/testdata/sf0.001"))
    assert(full.nonEmpty && fold == full)
  }

  test("sparse ~1‰ delta: fold ≡ full funnel") {
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
    val snapB = docs.filter(col("doc_id") % 1000 =!= 3)
      .select(
        when(col("doc_id") % 1000 === 7, col("doc_id") + 2000000000L)
          .otherwise(col("doc_id")).as("doc_id"),
        col("lang"), col("source"),
        when(col("doc_id") % 1000 === 5, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"),
        when(col("doc_id") % 1000 === 5, col("n_chars") + 5L)
          .otherwise(col("n_chars")).as("n_chars"))
    assert(census(DocQueries.incrementalCurationFunnel(docs, snapB)) ==
      census(DocQueries.curationFunnel(snapB)))
  }

  test("empty delta: fold ≡ full funnel (nothing re-verdicts)") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    assert(census(DocQueries.incrementalCurationFunnel(docs, docs)) ==
      census(DocQueries.curationFunnel(docs)))
  }

  test("keeper deletion: the hash group re-mins onto the survivor") {
    // D1 and D2 share normalized content; A keeps D1. B deletes D1 —
    // the fold must move the keep to D2, not drop the group.
    val p = "a01 a02 a03 a04 a05 a06 a07 a08 a09 a10 a11 a12"
    val snapA = frame(Seq(
      doc(1, "src00", p),
      doc(2, "src00", "b01 b02 b03 b04 b05 b06 b07 b08 b09 b10 b11 b12"),
      doc(3, "src01", "dup content here x01 x02 x03 x04 x05 x06 x07 x08"),
      doc(4, "src01", "dup content here x01 x02 x03 x04 x05 x06 x07 x08")))
    val snapB = frame(Seq(
      doc(1, "src00", p),
      doc(2, "src00", "b01 b02 b03 b04 b05 b06 b07 b08 b09 b10 b11 b12"),
      doc(4, "src01", "dup content here x01 x02 x03 x04 x05 x06 x07 x08")))
    val full = census(DocQueries.curationFunnel(snapB))
    val fold = census(DocQueries.incrementalCurationFunnel(snapA, snapB))
    assert(fold == full)
    assert(full.toMap.apply("1_exact_dedup") == 3L)
  }

  test("train flip: deleting the only carrier re-verdicts an untouched held doc") {
    val p = "p01 p02 p03 p04 p05 p06 p07 p08 p09 p10 p11 p12"
    val q = "q01 q02 q03 q04 q05 q06 q07 q08 q09 q10 q11 q12"
    val r = "r01 r02 r03 r04 r05 r06 r07 r08 r09 r10 r11 r12"
    // H1 carries all 10 of P's shingles (+1 of its own) → contaminated
    // in A; H4 is clean filler keeping src19 lengths equal.
    val snapA = frame(Seq(
      doc(1, "src00", p), doc(2, "src00", q),
      doc(10, "src19", p + " xx01"), doc(11, "src19", r + " xx02")))
    val snapB = frame(Seq(
      doc(2, "src00", q),
      doc(10, "src19", p + " xx01"), doc(11, "src19", r + " xx02")))
    // Sanity: H1 is contaminated in A's full funnel (3_decontam loses it).
    val fullA = census(DocQueries.curationFunnel(snapA)).toMap
    assert(fullA("2_length_gate") - fullA("3_decontam") == 1L,
      "fixture broken: H1 was not contaminated in A")
    val full = census(DocQueries.curationFunnel(snapB))
    val fold = census(DocQueries.incrementalCurationFunnel(snapA, snapB))
    assert(fold == full)
    // P's shingles left train (T1 deleted), so H1 — untouched by the
    // delta — must come back clean: nothing lost between gate and clean.
    assert(full.toMap.apply("3_decontam") == full.toMap.apply("2_length_gate"))
  }

  test("gate entrant: a newly-gated held doc is verdicted fresh") {
    val q = "q01 q02 q03 q04 q05 q06 q07 q08 q09 q10 q11 q12"
    val long1 = "s01 s02 s03 s04 s05 s06 s07 s08 s09 s10 s11 s12 s13 s14"
    val long2 = "t01 t02 t03 t04 t05 t06 t07 t08 t09 t10 t11 t12 t13 t14"
    // src19 in A: [69, 69, 64] → median 69, MAD 0 → H2 (the 64) is
    // gate-OUT, so its train overlap is never verdicted. B deletes one
    // 69 → [69, 64] → lower median 64, MAD 0 → H2 enters, H-long
    // leaves. H2 shares all 10 of Q's shingles → contaminated in B.
    val snapA = frame(Seq(
      doc(1, "src00", q),
      doc(10, "src19", long1), doc(11, "src19", long2),
      doc(12, "src19", q + " xx01")))
    val snapB = frame(Seq(
      doc(1, "src00", q),
      doc(10, "src19", long1),
      doc(12, "src19", q + " xx01")))
    val full = census(DocQueries.curationFunnel(snapB))
    val fold = census(DocQueries.incrementalCurationFunnel(snapA, snapB))
    assert(fold == full)
    val m = full.toMap
    assert(m("2_length_gate") == 2L, "fixture broken: gate shape changed")
    assert(m("3_decontam") == 1L,
      "fixture broken: the entrant was not verdicted contaminated")
  }
}
