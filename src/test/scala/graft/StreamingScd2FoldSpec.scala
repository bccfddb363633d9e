package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{EventQueries, StreamQueries}
import graft.streaming.EventStreams

/** q162 streaming SCD2 maintenance: the load-bearing property is that the
  * stream-maintained dimension EQUALS the batch rebuild — that equality is
  * why q162's registered oracle is q137's rebuild SQL verbatim. Pinned
  * here three ways:
  *   1. sequential CLOSED-SLAB folds (the multi-batch shape the
  *      closed-batch restriction licenses) equal the rebuild on the real
  *      events table;
  *   2. the registered replay query equals the registered batch rebuild
  *      query frame-for-frame;
  *   3. the versioned fold store machinery itself: the seed survives an
  *      empty stream, and a MemoryStream-driven run through
  *      [[EventStreams.runVersionedFold]] lands on the rebuild whatever
  *      micro-batch slicing the source produced.
  * The out-of-order violation raise is pinned in Scd2IncrementalSpec (the
  * guard is IN the fold plan, so it fires identically under streaming). */
class StreamingScd2FoldSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def canon(df: DataFrame) =
    df.select("user_id", "state", "valid_from", "valid_to", "version",
        "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.get(2).toString,
        r.get(3).toString, r.getLong(4), r.getBoolean(5)))
      .sortBy(t => (t._1, t._5)).toList

  test("sequential closed-slab folds equal the rebuild (multi-batch)") {
    val events = graft.sources.Tables(spark, sf, "events")
    val d1 = to_timestamp(lit("2024-01-10 00:00:00"))
    val d2 = to_timestamp(lit("2024-01-20 00:00:00"))
    val standing = EventQueries.scd2(events.filter(col("ts") < d1),
      "user_id", "event_type")
    val afterSlab1 = EventQueries.scd2Incremental(standing,
      events.filter(col("ts") >= d1 && col("ts") < d2),
      key = "user_id", state = "event_type")
    // The second fold reads the FIRST fold's output as its standing
    // dimension — exactly what consecutive micro-batches do through the
    // versioned store (materialized here as the store would).
    val afterSlab2 = EventQueries.scd2Incremental(
      afterSlab1.localCheckpoint(),
      events.filter(col("ts") >= d2),
      key = "user_id", state = "event_type")
    val rebuild = EventQueries.scd2(events, "user_id", "event_type")
    assert(canon(afterSlab2) == canon(rebuild))
  }

  test("registered q162 replay equals the registered q137 rebuild") {
    val streamed = StreamQueries.q162StreamScd2Fold(spark, sf)
    val rebuilt = EventQueries.q137Scd2Build(spark, sf)
    val a = streamed.collect().map(_.toSeq).toList
    val b = rebuilt.collect().map(_.toSeq).toList
    assert(a.nonEmpty && a == b)
  }

  test("runVersionedFold: empty stream returns the committed seed") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Long, String)]
    val arrivals = ms.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val seed = Seq((1L, "A", Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2200-01-01 00:00:00"), 1L, true))
      .toDF("user_id", "state", "valid_from", "valid_to", "version",
        "is_current")
    val out = EventStreams.runVersionedFold(spark, arrivals, seed,
      "target/fold-store/spec-empty")((base, batch) =>
      EventQueries.scd2Incremental(base, batch, "user_id", "event_type"))
    assert(canon(out) == canon(seed))
  }

  test("runVersionedFold via MemoryStream lands on the rebuild") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val history = Seq((1L, ts(1), 10L, "A"), (1L, ts(2), 11L, "B"),
      (2L, ts(1), 20L, "A"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val ms = MemoryStream[(Long, Timestamp, Long, String)]
    // Two time-closed blocks; whether the source serves them as one or
    // two micro-batches, the fold must land on the rebuild.
    ms.addData((12L, ts(10), 1L, "C"), (22L, ts(10), 2L, "B"))
    ms.addData((13L, ts(12), 1L, "B"), (40L, ts(12), 4L, "N"))
    val arrivals = ms.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val standing = EventQueries.scd2(history, "user_id", "event_type")
    val out = EventStreams.runVersionedFold(spark, arrivals, standing,
      "target/fold-store/spec-ms")((base, batch) =>
      EventQueries.scd2Incremental(base, batch, "user_id", "event_type"))
    val all = history.unionByName(Seq(
      (1L, ts(10), 12L, "C"), (2L, ts(10), 22L, "B"),
      (1L, ts(12), 13L, "B"), (4L, ts(12), 40L, "N"))
      .toDF("user_id", "ts", "event_id", "event_type"))
    val rebuild = EventQueries.scd2(all, "user_id", "event_type")
    assert(canon(out) == canon(rebuild))
  }
}
