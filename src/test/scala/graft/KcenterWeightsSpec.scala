package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EmbedQueries
import graft.sources.Tables

/** q175 coreset weights: the assignment census must certify the SAME
  * geometry the greedy certified — every vector's assigned distance is
  * its min-distance to the chosen centers, so max(cover_radius_u) must
  * equal q169's final radius, and the members must partition the
  * corpus (Σ n_members = n, weights sum to 10⁶ up to k floor
  * roundings). A planted two-cluster corpus pins the semantics: the
  * isolated far cluster wins its own center and exactly its own
  * members. */
class KcenterWeightsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(df: DataFrame): List[(Long, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toList

  test("members partition the corpus; cover radius equals the greedy radius") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .localCheckpoint()
    val traj = EmbedQueries.kcenterGreedy(emb, 6).localCheckpoint()
    val w = rows(EmbedQueries.kcenterWeights(emb, traj))
    assert(w.map(_._1) == (1L to 6L).toList)
    val n = emb.count()
    assert(w.map(_._3).sum == n, "members do not partition the corpus")
    val wsum = w.map(_._4).sum
    assert(wsum <= 1000000L && wsum >= 1000000L - 6,
      s"weights sum $wsum outside the k-rounding band")
    val finalRadius = traj.collect().map(r => (r.getLong(0), r.getLong(2)))
      .maxBy(_._1)._2
    assert(w.map(_._5).max == finalRadius,
      "cover radius disagrees with the greedy's final radius")
    // the trajectory's centers are the census's centers, round for round
    val trajCenters = traj.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toList
    assert(w.map(t => (t._1, t._2)) == trajCenters)
  }

  test("planted far cluster wins its own center and exactly its members") {
    def vec(hot: Int, eps: Float): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(hot) = 1.0f; a((hot + 1) % 64) = eps; a
    }
    // 9 vectors hugging axis 0, one isolated cluster of 3 on axis 7
    val near = (0L until 9L).map(i => (i, vec(0, 0.01f * (i % 3))))
    val far = (100L until 103L).map(i => (i, vec(7, 0.01f * (i % 2))))
    val emb = (near ++ far).toDF("vec_id", "embedding")
    val traj = EmbedQueries.kcenterGreedy(emb, 2).localCheckpoint()
    val centers = traj.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(centers(1L) == 0L, "seed is not the min vec_id")
    assert(centers(2L) >= 100L, "round 2 did not jump to the far cluster")
    val w = rows(EmbedQueries.kcenterWeights(emb, traj))
      .map(t => (t._2, t._3)).toMap
    assert(w(centers(1L)) == 9L && w(centers(2L)) == 3L,
      s"cluster membership censused wrong: $w")
  }
}
