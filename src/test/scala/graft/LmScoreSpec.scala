package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries

/** Behavior pins for the q95 bigram LM score: the probability boundary,
  * the fluency ordering, and the partition-exactness claim the integer
  * arithmetic exists to guarantee. */
class LmScoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def scores(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] =
    DocQueries.bigramLmScore(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, s) => id -> (n, s) }.toMap

  test("deterministic-successor corpus scores exactly 1e6 ppm everywhere") {
    // Every prefix has ONE successor corpus-wide → p(w2|w1) = 1 for every
    // bigram → integer mean is exactly 1,000,000 with no rounding loss.
    val out = scores(Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "a b c")))
    assert(out.values.forall(_._2 == 1000000L), s"expected all 1e6: $out")
    assert(out(1L)._1 == 3 && out(3L)._1 == 2)
  }

  test("a doc of corpus-typical bigrams outscores a doc with a surprising one") {
    val filler = (1 to 8).map(_ => "x y").mkString(" ")
    val out = scores(Seq(
      (1L, filler), (2L, filler), (3L, "x z")))
    assert(out(1L)._2 > out(3L)._2,
      s"the x→z doc must score below the x→y docs: $out")
  }

  test("scores are identical under any input partitioning") {
    // The reason p is quantized ppm BEFORE the mean: partial-aggregate
    // merges combine exact longs, so parallelism cannot move a score.
    val docs = (0L until 60L).map(i =>
      (i, s"w${i % 7} w${(i + 1) % 5} w${(i + 2) % 3} w${i % 2}"))
    val base = scores(docs)
    for (p <- Seq(1, 3, 13)) {
      val repart = DocQueries.bigramLmScore(
        docs.toDF("doc_id", "text").repartition(p))
        .as[(Long, Long, Long)].collect()
        .map { case (id, n, s) => id -> (n, s) }.toMap
      assert(repart == base, s"score moved under repartition($p)")
    }
  }
}
