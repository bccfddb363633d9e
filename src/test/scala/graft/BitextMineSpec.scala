package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EmbedQueries

/** q147 margin-based bitext mining: on a planted-alignment corpus (one
  * even/odd twin pair per well-separated cluster), the miner must find
  * every planted pair, must NOT mine across clusters (the margin
  * criterion's job — absolute cosine alone can't tell a hub from an
  * alignment), and the whole pipeline must be bit-identical under any
  * partitioning (buckets, micro-unit cosines, and integer margins leave
  * no float path for partition order to perturb). */
class BitextMineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 16 clusters × (even, odd) twins: ids 2c and 2c+1 sit in cluster c
    * with small independent noise — intra-pair cosine ≈ 0.96+,
    * cross-cluster ≈ 0 (the ClusteredEmbeddings geometry). */
  private def planted = (0L until 32L)
    .map(id => (id, ClusteredEmbeddings.vector(id / 2).toSeq
      .zipWithIndex
      .map { case (v, i) =>
        (v + 0.01f * (((id * 64 + i) % 7).toFloat - 3f)).toFloat }))
    .toDF("vec_id", "embedding")
    .select(col("vec_id"), col("embedding").cast("array<float>")
      .as("embedding"))

  test("every planted aligned pair is mined, and nothing else") {
    val got = EmbedQueries.bitextMarginMine(planted, k = 4,
        thresholdPpm = 1050000L)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until 16L).map(c => (2 * c, 2 * c + 1)).toSet
    assert(got == want,
      s"missing: ${want -- got}; spurious: ${got -- want}")
  }

  test("mined pairs carry margins above an unaligned corpus's") {
    val out = EmbedQueries.bitextMarginMine(planted, k = 4,
      thresholdPpm = 1050000L)
    val margins = out.select("margin_ppm").collect().map(_.getLong(0))
    // a true alignment against near-orthogonal neighbors: the margin is
    // far above the mutual-best-by-accident regime
    assert(margins.forall(_ >= 1500000L),
      s"weak planted margins: ${margins.min}")
  }

  test("assignment is bit-identical under every partitioning") {
    val ref = EmbedQueries.bitextMarginMine(planted, 4, 1050000L)
      .collect().map(_.toSeq).toList
    for (p <- Seq(1, 3, 16)) {
      val got = EmbedQueries
        .bitextMarginMine(planted.repartition(p), 4, 1050000L)
        .collect().map(_.toSeq).toList
      assert(got == ref, s"diverged at repartition($p)")
    }
  }

  test("raising the threshold yields a subset; collections stay disjoint") {
    val lo = EmbedQueries.bitextMarginMine(planted, 4, 1050000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hi = EmbedQueries.bitextMarginMine(planted, 4, 2000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hi.subsetOf(lo))
    assert(lo.forall { case (a, b) => a % 2 == 0 && b % 2 == 1 })
  }
}
