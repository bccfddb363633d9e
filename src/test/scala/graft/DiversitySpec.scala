package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries

/** q149 n-gram diversity audit: exact counts on a hand fixture, and the
  * diagnostic property the audit exists for — a template-spun source
  * scores high bigram repetition and low type-token ratio against a
  * diverse source of the same size. */
class DiversitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tok = Seq(
    ("spun", Seq("a", "b", "a", "b")),     // 4 toks, 2 types; bigrams
                                           // [a b, b a, a b]: 3 total, 2 types
    ("spun", Seq("a", "b", "a", "b")),
    ("varied", Seq("w", "x", "y", "z")),   // all distinct
    ("varied", Seq("p", "q", "r", "s")))
    .toDF("source", "toks")

  test("exact counts and ppm ratios on the hand fixture") {
    val got = DocQueries.diversityAudit(tok).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // spun: 2 docs, 8 tokens, 2 types, 6 bigram slots, 2 bigram types
    assert(got("spun") == ((2L, 8L, 2L, 6L, 2L,
      2L * 1000000L / 8L, (6L - 2L) * 1000000L / 6L)))
    // varied: 2 docs, 8 tokens, 8 types, 6 bigram slots, 6 bigram types
    assert(got("varied") == ((2L, 8L, 8L, 6L, 6L, 1000000L, 0L)))
  }

  test("template-spun source reads as repetitive, diverse as diverse") {
    val got = DocQueries.diversityAudit(tok).collect()
      .map(r => r.getString(0) -> ((r.getLong(6), r.getLong(7)))).toMap
    val (spunTtr, spunRep) = got("spun")
    val (varTtr, varRep) = got("varied")
    assert(spunTtr < varTtr && spunRep > varRep)
  }

  test("single-token docs contribute no bigram slots") {
    val t = Seq(("s", Seq("only")), ("s", Seq("a", "b"))).toDF("source", "toks")
    val r = DocQueries.diversityAudit(t).collect()(0)
    assert(r.getLong(2) == 3L && r.getLong(4) == 1L,
      "expected 3 tokens and exactly one bigram slot")
  }
}
