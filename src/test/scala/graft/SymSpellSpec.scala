package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries

/** q138 completeness: the deletion-neighborhood candidate generator must
  * find EVERY Levenshtein ≤ 1 pair the exhaustive cross join finds —
  * substitutions, insertions, AND deletions — and nothing else (the
  * verify step kills distance-2 pairs that coincidentally share a
  * deletion variant). The q110/q126 banded ≡ exhaustive discipline on
  * strings. */
class SymSpellSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val names = Seq(
    "alpha",   // base
    "alphb",   // substitution of 'a' -> 'b' (d=1 to alpha)
    "alph",    // deletion (d=1 to alpha, d=1 to alphb)
    "aalpha",  // insertion (d=1 to alpha)
    "beta", "betta", "bet",
    "gamma", "gama",
    "delta", "delta",  // exact duplicate under two keys
    "omega")           // isolated

  test("banded pairs equal the exhaustive levenshtein<=1 pairs exactly") {
    val df = names.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("k", "w")
    val banded = DocQueries.editDistance1Pairs(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.k") < col("b.k") &&
        levenshtein(col("a.w"), col("b.w")) <= 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(banded == brute,
      s"missing=${brute -- banded} extra=${banded -- brute}")
    assert(brute.nonEmpty, "fixture must exercise real pairs")
  }

  test("a distance-2 pair sharing a deletion variant is verified away") {
    // "abcd" minus pos 2 = "acd"; "acde" minus pos 4 = "acd" — shared
    // variant, but levenshtein(abcd, acde) = 2: candidate, not a match.
    val df = Seq((1L, "abcd"), (2L, "acde")).toDF("k", "w")
    assert(DocQueries.editDistance1Pairs(df).count() == 0)
  }
}
