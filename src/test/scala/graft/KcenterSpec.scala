package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EmbedQueries
import graft.sources.Tables

/** q169 k-center greedy coreset: the trajectory properties that make
  * Gonzalez's farthest-point traversal THE coreset picker — the radius
  * curve is non-increasing (each center can only improve coverage), the
  * final radius actually COVERS (every vector within radius of some
  * center — the definition the 2-approximation bound is stated in),
  * the trajectory is deterministic under any partitioning, and on a
  * clustered corpus the traversal jumps BETWEEN clusters (maximal
  * diversity — the reason pipelines use it for exemplar picking). */
class KcenterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def traj(df: DataFrame): List[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toList

  test("radius curve is non-increasing; centers are distinct") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val t = traj(EmbedQueries.kcenterGreedy(emb, 6))
    assert(t.map(_._1) == (1L to 6L).toList)
    assert(t.map(_._2).distinct.size == 6, "a center was picked twice")
    t.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 <= a._3, s"radius grew from round ${a._1} to ${b._1}")
    }
  }

  test("seed is the min vec_id; round 2 is the brute-force farthest") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .localCheckpoint()
    val t = traj(EmbedQueries.kcenterGreedy(emb, 2))
    val minId = emb.agg(min("vec_id")).collect()(0).getLong(0)
    assert(t.head._2 == minId)
    // brute-force farthest from the seed under the same integer metric
    val seed = emb.filter(col("vec_id") === minId)
      .select(col("embedding").as("sv")).crossJoin(emb)
      .select(col("vec_id"),
        (lit(1000000L) - round(
          aggregate(zip_with(col("embedding"), col("sv"), (a, b) => a * b),
            lit(0.0d), (acc, x) => acc + x) /
          (sqrt(aggregate(zip_with(col("embedding"), col("embedding"),
            (a, b) => a * b), lit(0.0d), (acc, x) => acc + x)) *
           sqrt(aggregate(zip_with(col("sv"), col("sv"),
            (a, b) => a * b), lit(0.0d), (acc, x) => acc + x))) * 1e6)
          .cast("long")).as("d"))
      .orderBy(desc("d"), asc("vec_id")).limit(1)
      .collect()(0).getLong(0)
    assert(t(1)._2 == seed)
  }

  test("the final radius covers: every vector near some center") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .localCheckpoint()
    val t = traj(EmbedQueries.kcenterGreedy(emb, 6))
    val finalRadius = t.last._3
    val centers = emb.filter(col("vec_id").isin(t.map(_._2): _*))
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    val minDist = emb.crossJoin(centers)
      .select(col("vec_id"),
        (lit(1000000L) - round(
          aggregate(zip_with(col("embedding"), col("cv"), (a, b) => a * b),
            lit(0.0d), (acc, x) => acc + x) /
          (sqrt(aggregate(zip_with(col("embedding"), col("embedding"),
            (a, b) => a * b), lit(0.0d), (acc, x) => acc + x)) *
           sqrt(aggregate(zip_with(col("cv"), col("cv"),
            (a, b) => a * b), lit(0.0d), (acc, x) => acc + x))) * 1e6)
          .cast("long")).as("d"))
      .groupBy("vec_id").agg(min("d").as("d"))
      .agg(max("d")).collect()(0).getLong(0)
    assert(minDist == finalRadius,
      s"reported radius $finalRadius vs recomputed cover $minDist")
  }

  test("trajectory is identical under every partitioning") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val base = traj(EmbedQueries.kcenterGreedy(emb, 4))
    for (p <- Seq(1, 7)) {
      assert(traj(EmbedQueries.kcenterGreedy(emb.repartition(p), 4)) == base,
        s"trajectory diverged at repartition($p)")
    }
  }

  test("clustered corpus: the traversal jumps between clusters") {
    val emb = Tables(spark, ClusteredEmbeddings.ensure(spark), "embeddings")
    val t = traj(EmbedQueries.kcenterGreedy(emb, 6))
    // cluster of vec_id i is i % 16 on the fixture
    val clusters = t.map(_._2 % 16)
    assert(clusters.distinct.size == 6,
      s"farthest-point traversal revisited a cluster: $clusters")
  }
}
