package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural guarantees of q115 (paragraph boilerplate removal) and
  * q116 (priority-sampling weighted draw) beyond the value oracle:
  * reconstruction order, the total-loss edge, top-k maximality of the
  * sample, and the plan shapes the 100 TB posture claims (anti-join for
  * the cut, TakeOrderedAndProject — never a global sort — for the
  * draw). */
class ParagraphSampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def tokFrame(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
  }

  test("q115 cuts shared paragraphs, keeps order, keeps total-loss docs as empty rows") {
    // Paragraph width 2: docs 1 and 2 share the paragraph "x y"; doc 3 is
    // an exact copy of doc 4 (every paragraph shared); doc 5 is unique.
    val tok = tokFrame(Seq(
      1L -> "a b x y c d",
      2L -> "x y e f",
      3L -> "p q r s",
      4L -> "p q r s",
      5L -> "u v w z q2"))
    val out = graft.queries.DocQueries.paragraphDedup(tok, para = 2, maxDocs = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 3L, 2L, "a b c d")), s"doc 1 got ${out(0)}")
    assert(out(1) == ((2L, 2L, 1L, "e f")), s"doc 2 got ${out(1)}")
    assert(out(2) == ((3L, 2L, 0L, "")), "exact-dup doc must survive as an empty row")
    assert(out(3) == ((4L, 2L, 0L, "")))
    assert(out(4) == ((5L, 3L, 3L, "u v w z q2")), "unique doc must pass through unchanged")
  }

  test("q115 reconstruction concatenates surviving paragraphs in paragraph order") {
    // 3 paragraphs of width 2; the MIDDLE one is shared with doc 2 — the
    // rebuilt text must splice around it, not reorder.
    val tok = tokFrame(Seq(1L -> "a1 a2 bb bb c1 c2", 2L -> "bb bb"))
    val out = graft.queries.DocQueries.paragraphDedup(tok, para = 2, maxDocs = 1)
      .filter(col("doc_id") === 1L).collect()(0)
    assert(out.getString(3) == "a1 a2 c1 c2")
  }

  test("q115 within-doc repetition alone is NOT boilerplate (df counts distinct docs)") {
    val tok = tokFrame(Seq(1L -> "r r r r", 2L -> "s t u v"))
    val out = graft.queries.DocQueries.paragraphDedup(tok, para = 2, maxDocs = 1)
      .filter(col("doc_id") === 1L).collect()(0)
    assert(out.getLong(2) == 2L && out.getString(3) == "r r r r",
      "a paragraph repeated inside ONE doc stays (the q59 signal, not this one)")
  }

  test("q116 is a maximal top-100 by priority and deterministic") {
    val sel = graft.queries.DocQueries.q116WeightedSample(spark, sf)
    val rows = sel.collect()
    assert(rows.length == 100)
    val selIds = rows.map(_.getLong(0)).toSet
    // Independent full priority table: every selected priority must be
    // >= every excluded one (the defining property of the sample).
    val all = graft.sources.Tables(spark, sf, "documents")
      .select(col("doc_id"),
        (size(split(lower(trim(col("text"))), "\\s+")).cast("double") * 4294967296.0 /
          (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("double") + 1.0)).as("pr"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val minSel = all.filter(p => selIds(p._1)).map(_._2).min
    val maxExcl = all.filterNot(p => selIds(p._1)).map(_._2).max
    assert(minSel >= maxExcl, s"non-maximal sample: $minSel < $maxExcl")
    val again = graft.queries.DocQueries.q116WeightedSample(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(again == rows.map(_.getLong(0)).toSeq, "re-execution must reproduce the sample")
  }

  test("plan pins: q115 anti-join cut; q116 TakeOrderedAndProject, no global sort") {
    val p115 = graft.queries.DocQueries.q115ParagraphDedup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p115.contains("LeftAnti"), "the boilerplate cut must plan as an anti-join")
    assert(!p115.contains("CartesianProduct") && !p115.contains("BroadcastNestedLoop"))
    val p116 = graft.queries.DocQueries.q116WeightedSample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p116.contains("TakeOrderedAndProject"),
      "the draw must be a partial top-k, never a global sort of the corpus")
    assert(!p116.contains("Exchange rangepartitioning"),
      "no range-partitioned global sort in the sample path")
  }
}
