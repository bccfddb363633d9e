package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries

/** Behavior tests for the prefix-filtered containment join (q66):
  * directionality, the contained-pair-invisible-to-Jaccard case, and the
  * threshold boundary. The exact-recall property lives in
  * [[ContainmentPropsSpec]] (brute-force equality on random corpora); the
  * registry's DuckDB oracle restates it exhaustively on the fixtures.
  */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val article =
    "breaking news the river crested overnight flooding three districts " +
      "and closing the old stone bridge until engineers can inspect it"

  test("near-subset doc is flagged as contained; containment is directional") {
    val docs = Seq(
      // 2 quotes 1 almost entirely, with its own framing around it
      (1L, article),
      (2L, "as reported earlier " + article + " officials will meet tomorrow"),
      (3L, "entirely unrelated text about columnar shuffles and parquet row groups in a distributed engine today")
    ).toDF("doc_id", "text")
    val out = DocQueries.containmentJoin(docs, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // 1's shingles all appear in 2 → (1, 2); 2 has framing shingles absent
    // from 1, so the reverse direction stays below 0.8.
    assert(out == Set((1L, 2L)))
  }

  test("a contained pair invisible to Jaccard banding is still found") {
    // Small doc inside a much larger one: containment 1.0, Jaccard low —
    // the case the scaladoc claims MinHash banding structurally misses.
    val small = "the quick brown fox jumps over the lazy dog"
    val filler = (1 to 40).map(i => s"filler$i word$i tail$i").mkString(" ")
    val docs = Seq((1L, small), (2L, small + " " + filler)).toDF("doc_id", "text")
    val cont = DocQueries.containmentJoin(docs, 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(cont == Set((1L, 2L, 1.0)))
    val mh = DocQueries.minhashNeardup(docs, 0.9).count()
    assert(mh == 0, "jaccard path should NOT pair these (containment ≠ jaccard)")
  }

  test("threshold boundary: a pair at exactly t is kept") {
    // 1 has 5 shingles, exactly 4 shared with 2 → containment 0.8.
    val a = "w1 w2 w3 w4 w5 w6 w7"
    val b = "w1 w2 w3 w4 w5 w6 x7"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val out = DocQueries.containmentJoin(docs, 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 2L, 0.8), (2L, 1L, 0.8)))
  }

  test("sub-3-token docs produce no shingles and cannot pair") {
    val docs = Seq((1L, "two words"), (2L, "two words"), (3L, ""))
      .toDF("doc_id", "text")
    assert(DocQueries.containmentJoin(docs, 0.5).count() == 0)
  }
}
