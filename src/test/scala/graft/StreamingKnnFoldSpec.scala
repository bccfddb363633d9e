package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{EmbedQueries, StreamQueries}
import graft.sources.Tables

/** q163 streaming kNN maintenance: the load-bearing property is that the
  * stream-maintained graph EQUALS the batch rebuild under ANY micro-batch
  * slicing — that slicing-invariance (banded candidate sets depend on
  * bucket membership, not arrival order) is why q153's SQL serves as
  * q163's oracle. Pinned as: 2-slice sequential fold ≡ 1-shot fold ≡
  * rebuild; the registered replay equals the registered q153 build;
  * re-delivered vectors are no-ops (the marker set makes the fold
  * idempotent); and markers exactly track the folded vector set. */
class StreamingKnnFoldSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def canonEdges(df: DataFrame) =
    df.filter(col("rank") > 0L)
      .select("vec_id", "nbr_id", "rank", "cos_u")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._1, t._3)).toList

  private def foldStep(base: DataFrame, batchIds: Column,
                       emb: DataFrame): DataFrame =
    EmbedQueries.knnStreamFold(base,
      emb.filter(batchIds).select("vec_id", "embedding"), emb, 3)
      .localCheckpoint() // what the versioned store does between batches

  test("2-slice sequential fold ≡ 1-shot fold ≡ rebuild") {
    val emb = Tables(spark, sf, "embeddings")
    val isDelta = col("vec_id") % 10 === 7
    val seed = EmbedQueries.knnFoldSeed(emb.filter(!isDelta), 3)
    // one shot: the whole delta in a single micro-batch
    val oneShot = foldStep(seed, isDelta, emb)
    // two slices: the same delta split by id parity across two batches
    val s1 = foldStep(seed, isDelta && col("vec_id") % 20 === 7, emb)
    val s2 = foldStep(s1, isDelta && col("vec_id") % 20 === 17, emb)
    val rebuild = EmbedQueries.knnGraph(emb, 3)
    assert(canonEdges(oneShot) == canonEdges(rebuild))
    assert(canonEdges(s2) == canonEdges(rebuild))
  }

  test("registered q163 replay equals the registered q153 build") {
    val streamed = StreamQueries.q163StreamKnnFold(spark, sf)
    val rebuilt = EmbedQueries.q153KnnGraph(spark, sf)
    val a = streamed.collect().map(_.toSeq).toList
    val b = rebuilt.collect().map(_.toSeq).toList
    assert(a.nonEmpty && a == b)
  }

  test("re-delivered vectors are no-ops; markers track the folded set") {
    val emb = Tables(spark, ClusteredEmbeddings.ensure(spark), "embeddings")
    val isDelta = col("vec_id") % 10 === 7
    val seed = EmbedQueries.knnFoldSeed(emb.filter(!isDelta), 3)
    val once = foldStep(seed, isDelta, emb)
    // the SAME batch re-delivered (an at-least-once source retry): the
    // marker set must make the second application a no-op
    val twice = foldStep(once, isDelta, emb)
    assert(canonEdges(twice) == canonEdges(once))
    // markers exactly track the folded set: every corpus vector has one
    // rank-0 marker row after the full delta folded — including any
    // vector that emitted zero edges
    val markers = once.filter(col("rank") === 0L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val corpus = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(markers == corpus)
  }
}
