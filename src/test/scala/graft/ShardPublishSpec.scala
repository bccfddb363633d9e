package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries
import graft.sources.Tables

/** q165 incremental shard publishing: the load-bearing property is
  * FOLD ≡ FULL-EXPORT — keeping yesterday's files for every shard the
  * diff marks standing (republish = 0) and re-exporting only the marked
  * shards reproduces the full re-export of today's snapshot exactly.
  * That holds because a standing shard has the identical member set and
  * content in both snapshots (shard assignment is doc_id-pure, so a doc
  * can't move shards without reading as delete + add). Pinned on the
  * real table's derived snapshots and on planted single-verdict deltas;
  * identical snapshots must publish nothing. */
class ShardPublishSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def census(df: DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  private def snapshots(dir: String): (DataFrame, DataFrame) = {
    val docs = Tables(spark, dir, "documents")
    val snapA = docs.select(col("doc_id"), col("text"), col("n_chars"))
    val snapB = docs.filter(col("doc_id") % 10 =!= 3)
      .select(
        when(col("doc_id") % 10 === 7, col("doc_id") + 1000000000L)
          .otherwise(col("doc_id")).as("doc_id"),
        when(col("doc_id") % 10 === 5, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"),
        when(col("doc_id") % 10 === 5, col("n_chars") + 5L)
          .otherwise(col("n_chars")).as("n_chars"))
    (snapA, snapB)
  }

  private def exportCensus(snap: DataFrame) =
    DocQueries.shardExport(snap.select(col("doc_id"), col("n_chars")),
      "seed42", 64)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap

  test("fold ≡ full-export: standing shards' A-census equals B-census") {
    val (snapA, snapB) = snapshots(sf)
    val publish = DocQueries
      .incrementalShardPublish(snapA, snapB, "seed42", 64)
      .collect().map(r => r.getLong(0) -> r.getLong(6)).toMap // shard -> republish
    val exportA = exportCensus(snapA)
    val exportB = exportCensus(snapB)
    val standing = publish.filter(_._2 == 0L).keySet
    val marked = publish.filter(_._2 == 1L).keySet
    assert(standing.nonEmpty && marked.nonEmpty,
      "fixture must exercise both outcomes")
    // standing shards: yesterday's files ARE today's export
    standing.foreach { s =>
      assert(exportA(s) == exportB(s), s"standing shard $s diverged")
    }
    // the assembled publish (A for standing, B re-export for marked)
    // equals the full export of B
    val assembled = standing.map(s => s -> exportA(s)).toMap ++
      marked.map(s => s -> exportB(s)).toMap
    assert(assembled == exportB)
  }

  test("identical snapshots publish nothing") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
    val out = DocQueries.incrementalShardPublish(docs, docs, "seed42", 64)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L,
        s"shard ${r.getLong(0)} reported a delta on identical snapshots")
      assert(r.getLong(6) == 0L)
    }
  }

  test("a single edited doc marks exactly its own shard") {
    val snapA = Seq((1L, "alpha", 5L), (2L, "beta", 4L), (3L, "gamma", 5L))
      .toDF("doc_id", "text", "n_chars")
    val snapB = Seq((1L, "alpha", 5L), (2L, "beta EDIT", 9L), (3L, "gamma", 5L))
      .toDF("doc_id", "text", "n_chars")
    val out = DocQueries.incrementalShardPublish(snapA, snapB, "seed42", 64)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6))).toMap
    val changedShards = out.filter { case (_, (_, _, ch, _)) => ch > 0 }
    assert(changedShards.size == 1)
    assert(changedShards.head._2 == ((0L, 0L, 1L, 1L)))
    out.filterNot(kv => changedShards.contains(kv._1)).values.foreach { v =>
      assert(v == ((0L, 0L, 0L, 0L)))
    }
  }

  test("a mover (same content, new id) reads delete + add, never in-place") {
    val snapA = Seq((1L, "alpha", 5L), (2L, "beta", 4L))
      .toDF("doc_id", "text", "n_chars")
    val snapB = Seq((1L, "alpha", 5L), (9002L, "beta", 4L))
      .toDF("doc_id", "text", "n_chars")
    val out = DocQueries.incrementalShardPublish(snapA, snapB, "seed42", 64)
      .collect()
    val adds = out.map(_.getLong(1)).sum
    val dels = out.map(_.getLong(2)).sum
    val changes = out.map(_.getLong(3)).sum
    assert(adds == 1L && dels == 1L && changes == 0L)
  }
}
