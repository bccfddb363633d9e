package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries

/** The q100 claim is an EQUALITY: the bucketed two-level prefix sum must
  * reproduce the naive global running sum exactly, for any bucket width —
  * the width is a parallelism dial, never a semantics dial. */
class TokenBlocksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def toksDf(rows: Seq[(Long, Seq[String])]) =
    rows.toDF("doc_id", "toks")

  test("two-level prefix sum equals the naive global window at every bucket width") {
    // Irregular lengths, non-contiguous doc_ids (gaps + a bucket-boundary
    // straddle), one single-token doc.
    val docs = toksDf(Seq(
      (0L, Seq.fill(100)("a")), (1L, Seq.fill(57)("b")),
      (7L, Seq.fill(300)("c")), (99L, Seq("d")),
      (100L, Seq.fill(200)("e")), (101L, Seq.fill(255)("f")),
      (250L, Seq.fill(512)("g"))))
    val naive = {
      val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      docs.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
        .withColumn("offset", coalesce(sum("n_tokens").over(w), lit(0L)))
        .select(col("doc_id"), col("n_tokens"), col("offset"),
          expr("offset div 256").as("block_first"),
          expr("(offset + n_tokens - 1) div 256").as("block_last"))
        .withColumn("blocks_spanned", col("block_last") - col("block_first") + 1)
        .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    }
    for (width <- Seq(1L, 7L, 100L, 1000L)) {
      val got = DocQueries.tokenBlocks(docs, 256L, width)
        .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == naive, s"bucket width $width diverged from the global scan")
    }
  }

  test("auto width (√n rule) reproduces the fixed-width result exactly") {
    val docs = toksDf((0L until 50L).map(i =>
      (i * 2 + (i % 3), Seq.fill((i % 11 + 1).toInt)("t"))))
    val auto = DocQueries.tokenBlocksAuto(docs, 64L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val fixed = DocQueries.tokenBlocks(docs, 64L, 13L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(auto == fixed, "the derived width changed the output")
  }

  test("offsets are gapless and blocks partition the token stream") {
    val docs = toksDf((0L until 40L).map(i =>
      (i * 3, Seq.fill((i % 7 + 1).toInt)("t"))))
    val rows = DocQueries.tokenBlocks(docs, 8L, 10L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // Gapless concatenation: each doc starts where the previous ended.
    rows.sliding(2).foreach {
      case Seq((_, n1, o1, _, _, _), (_, _, o2, _, _, _)) =>
        assert(o2 == o1 + n1, "offset gap — the concat stream tore")
      case _ =>
    }
    // Block arithmetic: first/last derive from offset and length alone.
    rows.foreach { case (_, n, off, bf, bl, span) =>
      assert(bf == off / 8 && bl == (off + n - 1) / 8 && span == bl - bf + 1)
    }
  }
}
