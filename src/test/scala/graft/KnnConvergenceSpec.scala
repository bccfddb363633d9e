package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EmbedQueries
import graft.sources.Tables

/** q172 NN-Descent to convergence: the stopping decision is the
  * property — `rounds_taken` must be the FIRST round whose refinement
  * changed no edge (the q146 converged-rank idiom: the oracle unrolls
  * the same integer stopping rule, so certifying it here certifies the
  * hash match isn't accidental). Pinned:
  *   1. the result equals manually iterating [[EmbedQueries.knnRefine]]
  *      for exactly `rounds_taken` rounds, every earlier round changed
  *      something, and (when not capped) the result is a FIXPOINT —
  *      one more refinement returns it unchanged;
  *   2. the global cos-sum is monotone non-decreasing round over round
  *      (the per-vector argument KnnRefineSpec pins, summed);
  *   3. maxRounds caps: with cap 1 the result is exactly one
  *      refinement round carrying rounds_taken = 1. */
class KnnConvergenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def edges(df: DataFrame): Set[(Long, Long)] =
    df.select("vec_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("rounds_taken is the first no-change round; result is a fixpoint") {
    val emb = Tables(spark, sf, "embeddings")
    val g0 = EmbedQueries.knnGraph(emb, kNbrs = 3)
    val out = EmbedQueries.knnRefineConverged(g0, emb, kNbrs = 3,
      maxRounds = 6).localCheckpoint()
    val rounds = out.select("rounds_taken").head.getLong(0)
    assert(rounds >= 1 && rounds <= 6)
    // replay the loop by hand and collect each round's change count
    var g = g0.localCheckpoint()
    val changes = scala.collection.mutable.ArrayBuffer[Long]()
    var sums = scala.collection.mutable.ArrayBuffer[Long](
      g.agg(sum("cos_u")).head.getLong(0))
    for (_ <- 1L to rounds) {
      val next = EmbedQueries.knnRefine(g, emb, 3).localCheckpoint()
      changes += next.select("vec_id", "nbr_id")
        .join(g.select("vec_id", "nbr_id"), Seq("vec_id", "nbr_id"),
          "left_anti").count()
      sums += next.agg(sum("cos_u")).head.getLong(0)
      g = next
    }
    assert(changes.init.forall(_ > 0),
      s"loop overshot: a pre-final round already changed nothing ($changes)")
    if (rounds < 6) {
      assert(changes.last == 0, s"stopped before the fixpoint ($changes)")
      assert(edges(EmbedQueries.knnRefine(g, emb, 3)) == edges(g),
        "declared fixpoint moved under one more refinement")
    }
    assert(edges(out) == edges(g), "result differs from the manual replay")
    // monotone recall proxy: total cos-sum never decreases
    sums.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a, s"cos-sum regressed: $sums")
    }
  }

  test("maxRounds = 1 caps at exactly one refinement round") {
    val emb = Tables(spark, sf, "embeddings")
    val g0 = EmbedQueries.knnGraph(emb, kNbrs = 3)
    val out = EmbedQueries.knnRefineConverged(g0, emb, 3, maxRounds = 1)
      .localCheckpoint()
    assert(out.select("rounds_taken").head.getLong(0) == 1L)
    assert(edges(out) == edges(EmbedQueries.knnRefine(g0, emb, 3)))
  }

  test("registered q172 carries a consistent rounds_taken column") {
    val out = EmbedQueries.q172KnnRefineConverged(spark, sf)
      .localCheckpoint()
    val rts = out.select("rounds_taken").distinct().collect()
      .map(_.getLong(0)).toList
    assert(rts.size == 1, s"rounds_taken not constant: $rts")
    assert(out.count() > 0)
  }
}
