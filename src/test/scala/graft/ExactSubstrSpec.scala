package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries

/** Hand-computed fixtures for the ExactSubstr substring-dedup spans
  * (q93): duplicated passages must surface as maximal merged spans;
  * within-doc-only repetition must not. Positions are 1-based token
  * indices, spans inclusive. */
class ExactSubstrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long)] =
    DocQueries.exactSubstr(docs.toDF("doc_id", "text"), 3)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("overlapping duplicated trigrams merge into one span") {
    // A and B share the 4-token passage "alpha beta gamma delta":
    // two overlapping trigrams (A@1,2; B@2,3) → ONE maximal span each.
    val out = spans(Seq(
      (1L, "alpha beta gamma delta u1 u2"),
      (2L, "zzz alpha beta gamma delta yyy www qqq")))
    assert(out == Set((1L, 1L, 4L, 4L), (2L, 2L, 5L, 4L)))
  }

  test("separated duplicated passages stay separate spans") {
    // C shares "alpha beta gamma" with D (C@1) and "one two three" with E
    // (C@8); gap 8 > 1 + 3 → two islands in C.
    val out = spans(Seq(
      (3L, "alpha beta gamma x1 x2 x3 x4 one two three x5"),
      (4L, "alpha beta gamma d1 d2 d3 d4 d5"),
      (5L, "e1 e2 one two three e3")))
    assert(out == Set(
      (3L, 1L, 3L, 3L), (3L, 8L, 10L, 3L),
      (4L, 1L, 3L, 3L), (5L, 3L, 5L, 3L)))
  }

  test("touching (adjacent, non-overlapping) intervals fuse") {
    // F's dup positions are exactly {1, 4}: [1,3] and [4,6] touch
    // (4 = prevEnd + 1) → one contiguous 6-token redaction span.
    val out = spans(Seq(
      (6L, "m1 m2 m3 m4 m5 m6 f1"),
      (7L, "g1 m1 m2 m3 g2"),
      (8L, "m4 m5 m6 h1 h2")))
    assert(out == Set(
      (6L, 1L, 6L, 6L), (7L, 2L, 4L, 3L), (8L, 1L, 3L, 3L)))
  }

  test("redaction cuts exactly the spans and keeps everything else") {
    import org.apache.spark.sql.functions.{col, split, lower, trim}
    val docs = Seq(
      (1L, "alpha beta gamma delta u1 u2"),
      (2L, "zzz alpha beta gamma delta yyy www qqq"),
      (3L, "completely unrelated vocabulary here"),
      (4L, "alpha beta gamma delta")) // fully duplicated → empty rewrite
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
    val out = DocQueries.substrRedact(docs, 3)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(out == Set(
      (1L, 6L, 2L, "u1 u2"),
      (2L, 8L, 4L, "zzz yyy www qqq"),
      (3L, 4L, 4L, "completely unrelated vocabulary here"),
      (4L, 4L, 0L, "")))
  }

  test("keep-one redaction: the min-doc_id owner keeps each passage, per-passage") {
    import org.apache.spark.sql.functions.{col, split, lower, trim}
    // Doc 1 owns "alpha beta gamma delta" (shared with 2); doc 2 owns
    // "one two three" (shared with 3) — ownership is per-passage: doc 2
    // loses the first phrase but keeps the second.
    val docs = Seq(
      (1L, "alpha beta gamma delta u1 u2"),
      (2L, "alpha beta gamma delta one two three"),
      (3L, "x1 x2 one two three x3"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
    val out = DocQueries.substrRedactKeepOne(docs, 3)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(out == Set(
      (1L, 6L, 6L, "alpha beta gamma delta u1 u2"), // owner: untouched
      (2L, 7L, 3L, "one two three"),                // loses phrase 1, owns phrase 2
      (3L, 6L, 3L, "x1 x2 x3")))                    // loses phrase 2
  }

  test("within-doc repetition alone is not duplication; tiny docs are safe") {
    // W repeats its own trigram twice but shares nothing cross-doc;
    // T has < 3 tokens. Neither may emit a span (and neither may crash).
    val out = spans(Seq(
      (9L, "r1 r2 r3 qq qq qq qq r1 r2 r3"),
      (10L, "tiny doc"),
      (11L, "totally unrelated vocabulary about columnar shuffle hash exchanges")))
    assert(out.isEmpty)
  }
}
