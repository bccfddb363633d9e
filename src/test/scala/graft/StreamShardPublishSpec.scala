package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{DocQueries, StreamQueries}
import graft.streaming.EventStreams

/** q173 streaming incremental shard publisher: the load-bearing
  * property is stream ≡ batch — the keyed manifest upsert must drain to
  * the same merged manifest the batch full-outer join builds, under ANY
  * micro-batch slicing (that equality is why q173's registered oracle
  * is q165's census SQL verbatim). Pinned:
  *   1. the registered replay equals the registered batch q165
  *      frame-for-frame;
  *   2. a MemoryStream-driven multi-slab run (including a RE-DELIVERED
  *      row) through [[EventStreams.runVersionedFold]] +
  *      [[DocQueries.shardPublishFold]] lands on the batch census —
  *      deletes never arrive and still census correctly (the verdict is
  *      computed against the seeded A-side, not row presence). */
class StreamShardPublishSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(df: DataFrame): List[Seq[Any]] =
    df.collect().map(_.toSeq.toList: Seq[Any]).toList

  test("registered stream publisher equals batch q165") {
    val sf = "/root/testdata/sf0.001"
    val streamed = rows(StreamQueries.q173StreamShardPublish(spark, sf))
    val batch = rows(DocQueries.q165IncrementalShardPublish(spark, sf))
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("multi-slab MemoryStream fold (with re-delivery) equals the batch join") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def d(id: Long, text: String): (Long, String, Long) =
      (id, text, text.length.toLong)
    val aRows = Seq(d(1, "alpha one"), d(2, "beta two"), d(3, "gamma three"),
      d(4, "delta four"), d(5, "epsilon five"))
    val bRows = Seq(d(1, "alpha one"), // unchanged
      d(2, "beta two EDITED"),         // changed
      d(4, "delta four"),              // unchanged
      d(6, "zeta six"))                // added; 3 and 5 deleted
    val snapA = aRows.toDF("doc_id", "text", "n_chars")
    val snapB = bRows.toDF("doc_id", "text", "n_chars")
    val seed = snapA.select(col("doc_id"), md5(col("text")).as("h_a"),
      lit(null).cast("string").as("h_b"), lit(null).cast("long").as("nc_b"))
    val ms = MemoryStream[(Long, String, Long)]
    // two slabs; doc 1 re-delivered in slab 2 (identical content → no-op)
    ms.addData(bRows(0), bRows(1))
    ms.addData(bRows(2), bRows(3), bRows(0))
    val arrivals = ms.toDF().toDF("doc_id", "text", "n_chars")
      .select(col("doc_id"), md5(col("text")).as("h_b"),
        col("n_chars").as("nc_b"))
    val store = EventStreams.runVersionedFold(spark, arrivals, seed,
      "target/fold-store/spec-pub")(DocQueries.shardPublishFold)
    val streamed = rows(DocQueries.shardPublishCensus(store, "specseed", 8))
    val batch = rows(DocQueries.incrementalShardPublish(snapA, snapB,
      "specseed", 8))
    assert(streamed == batch)
    // the deletes really censused: 2 deleted docs across the shards
    val totalDeleted = streamed.map(_.apply(2).asInstanceOf[Long]).sum
    assert(totalDeleted == 2L)
  }
}
