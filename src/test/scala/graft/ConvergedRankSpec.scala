package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.GraphQueries

/** q146 convergence-checked TrustRank: the stopping rule is itself part
  * of the contract (rounds_taken is an oracle-checked output column), so
  * pin it from both ends — an epsilon above total mass stops after one
  * round, epsilon 0 runs to the maxIters cap — and pin the consistency
  * property that makes the adaptive dial trustworthy: the converged
  * result is bit-identical to the fixed-rounds operator run for exactly
  * rounds_taken rounds (same integer arithmetic, same stop). */
class ConvergedRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // two triangles bridged by one edge, seeds in the left triangle —
  // small enough to iterate fast, asymmetric enough that ranks move
  // for several rounds before settling.
  private def graph = {
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L),
      (3L, 4L), (4L, 5L), (5L, 3L)).toDF("src", "dst")
    val n = (0L to 5L).toDF("node")
    val s = Seq(0L, 1L).toDF("node")
    (e, n, s)
  }

  private def ranks(df: org.apache.spark.sql.DataFrame) =
    df.select("node", "rank_ppb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toList

  test("epsilon above total mass stops after exactly one round") {
    val (e, n, s) = graph
    val out = GraphQueries.pageRankSeededConverged(e, n, s,
      epsPpb = 2000000000L, maxIters = 10)
    assert(out.select("rounds_taken").distinct().collect()
      .map(_.getLong(0)).toList == List(1L))
    assert(ranks(out) == ranks(GraphQueries.pageRankSeeded(e, n, s, 1)))
  }

  test("epsilon zero runs to the maxIters cap") {
    val (e, n, s) = graph
    val out = GraphQueries.pageRankSeededConverged(e, n, s,
      epsPpb = 0L, maxIters = 4)
    assert(out.select("rounds_taken").distinct().collect()
      .map(_.getLong(0)).toList == List(4L))
    assert(ranks(out) == ranks(GraphQueries.pageRankSeeded(e, n, s, 4)))
  }

  test("converged ranks equal the fixed-rounds operator at rounds_taken") {
    val (e, n, s) = graph
    val out = GraphQueries.pageRankSeededConverged(e, n, s,
      epsPpb = 1000000L, maxIters = 50)
    val k = out.select("rounds_taken").first().getLong(0).toInt
    assert(k > 1 && k < 50,
      s"fixture should converge strictly inside the cap, took $k")
    assert(ranks(out) == ranks(GraphQueries.pageRankSeeded(e, n, s, k)))
    // the stop fired at the FIRST sub-epsilon round: delta(k-1 → k)
    // is below epsilon and delta(k-2 → k-1) is not
    def l1(a: Int, b: Int) =
      ranks(GraphQueries.pageRankSeeded(e, n, s, a))
        .zip(ranks(GraphQueries.pageRankSeeded(e, n, s, b)))
        .map { case ((_, x), (_, y)) => math.abs(x - y) }.sum
    assert(l1(k - 1, k) < 1000000L, "stopping delta not below epsilon")
    if (k >= 3)
      assert(l1(k - 2, k - 1) >= 1000000L,
        "stopped later than the first sub-epsilon round")
  }
}
