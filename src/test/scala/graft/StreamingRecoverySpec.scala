package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Fault tolerance (SURVEY §2.9 last row; VERDICT r2 items 1/5): the
  * reference gets exactly-once state from Kafka Streams changelog topics +
  * standby replicas; Structured Streaming's analogue is the checkpoint
  * (offset log + commit log + state store). These tests kill and resume a
  * checkpointed windowed aggregation and assert exactly-once window
  * emission across the restart, and prove the RocksDB state-store provider
  * (the documented 100 TB state option) yields identical results.
  */
class StreamingRecoverySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def nanos(s: String): Long = Timestamp.valueOf(s).getTime * 1000000L

  /** Write one events-shaped parquet chunk into the streaming input dir
    * (ts as nano-epoch long — the testdata writer's shape). */
  private def writeChunk(dir: String, rows: Seq[(Long, String, Long, String)]): Unit = {
    import spark.implicits._
    rows.map { case (id, t, u, e) => (id, nanos(t), u, e, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  /** One checkpointed AvailableNow run of the windowed-distinct topology:
    * file source → normalize → 1-min tumbling exact distinct → parquet
    * sink. Everything restart-relevant (seen files, watermark, window
    * state, sink commit log) lives under `cp`. */
  private def runOnce(in: String, out: String, cp: String): Unit = {
    val raw = spark.readStream.schema(EventStreams.eventSchema).parquet(in)
    val events = EventStreams.normalize(
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)")))
    val counts = EventStreams.windowedDistinct(events, col("event_type"), "event_type")
    val q = counts.writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", cp)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("exactly-once window emission across a checkpointed stop/resume") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-recovery").toString
    val (in, out, cp) = (s"$base/in", s"$base/out", s"$base/cp")

    // Chunk 1: windows 10:00 (users 1,2) and 10:01 (user 3); watermark ends
    // at 10:01:05, so only [10:00, 10:01) closes and is emitted.
    writeChunk(in, Seq(
      (1L, "2024-01-01 10:00:10", 1L, "A"),
      (2L, "2024-01-01 10:00:40", 2L, "A"),
      (3L, "2024-01-01 10:01:05", 3L, "A")))
    runOnce(in, out, cp)
    def results() = spark.read.parquet(out)
      .select("win_start", "event_type", "distinct_users")
      .as[(String, String, Long)].collect().toSeq
    assert(results().toSet == Set(("2024-01-01 10:00:00", "a", 2L)),
      s"first run: ${results()}")

    // The query is now stopped (driver "killed"). Chunk 2 arrives: a 10:01
    // straggler user and a 10:02 event that closes [10:01, 10:02).
    writeChunk(in, Seq(
      (4L, "2024-01-01 10:01:40", 4L, "A"),
      (5L, "2024-01-01 10:02:30", 5L, "A")))

    // Resume from the SAME checkpoint: the file-source log skips chunk 1,
    // the restored state still holds user 3, the restored watermark admits
    // the 10:01 straggler, and [10:01, 10:02) emits with BOTH users.
    runOnce(in, out, cp)
    val all = results()
    assert(all.map(r => (r._1, r._2)).distinct.size == all.size,
      s"window re-emitted across restart: $all")
    assert(all.toSet == Set(
      ("2024-01-01 10:00:00", "a", 2L),
      ("2024-01-01 10:01:00", "a", 2L)), s"got $all")

    // A third resume with no new data must be a no-op (idempotent restart).
    runOnce(in, out, cp)
    assert(results().toSet == all.toSet)
  }

  test("RocksDB state store provider yields identical results to default") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    def run(rocks: Boolean) = {
      val ss = EventStreams.streamSession(spark, rocksDbState = rocks)
      EventStreams.runToMemory(ss,
        EventStreams.windowedDistinct(
          EventStreams.fileReplaySource(ss, sf), col("event_type"), "event_type"))
        .select("win_start", "event_type", "distinct_users")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    }
    val default = run(rocks = false)
    val rocks = run(rocks = true)
    assert(rocks == default)
    assert(rocks.nonEmpty)
  }
}
