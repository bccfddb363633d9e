package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Lateness observability on the q32 topology (VERDICT r10 item 7): the
  * ObservationSpec pattern applied to a stream. Every micro-batch progress
  * must carry (a) the observed input metrics collected on the topology's
  * own scan and (b) the state operator's watermark-drop counter.
  *
  * Semantics pinned here because they are easy to misread in a monitor:
  * `numRowsDroppedByWatermark` counts rows dropped AT THE STATE OPERATOR,
  * i.e. after map-side partial aggregation — late rows that share a
  * (window, key) group within one micro-batch collapse to ONE dropped
  * row. Phase 1 injects late rows in distinct windows (groups == rows, so
  * the counter equals the injected late events exactly); phase 2 injects
  * two late rows in the SAME window and the counter moves by one. The
  * observer's rows_in sees every arriving row either way — observation
  * happens before the stateful operator — which is what lets a listener
  * reconcile arrived vs dropped with zero source re-reads. */
class StreamingLatenessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("observed rows_in + numRowsDroppedByWatermark account for injected late events") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Long)]
    val events = ms.toDF().toDF("ts", "event_type", "user_id")
    val counts = EventStreams.windowedDistinct(
      EventStreams.observedLateness(EventStreams.normalize(events)),
      col("event_type"), "event_type")
    val q = counts.writeStream
      .format("memory").queryName("lateness_sink").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    def dropsSoFar: Long =
      q.recentProgress.toSeq.flatMap(_.stateOperators)
        .map(_.numRowsDroppedByWatermark).sum
    try {
      // Batch 1: watermark ends the batch at max ts − 0 s = 10:01:05 —
      // every window ending at or before it is closed.
      ms.addData(
        (ts("2024-01-01 10:00:10"), "A", 1L),
        (ts("2024-01-01 10:00:40"), "A", 2L),
        (ts("2024-01-01 10:01:05"), "A", 3L))
      q.processAllAvailable()
      // Phase 1: two late rows aimed at two DIFFERENT closed windows
      // (one partial group each), one on-time row.
      ms.addData(
        (ts("2024-01-01 10:00:20"), "A", 4L), // late, window [10:00, 10:01)
        (ts("2024-01-01 09:59:30"), "A", 5L), // late, window [09:59, 10:00)
        (ts("2024-01-01 10:01:30"), "A", 6L))
      q.processAllAvailable()
      assert(dropsSoFar == 2L,
        s"distinct-window late rows must count 1:1, got $dropsSoFar")

      // Phase 2: two late rows in the SAME closed window — map-side
      // partial aggregation collapses them to ONE dropped state row.
      ms.addData(
        (ts("2024-01-01 10:00:45"), "A", 7L), // late, window [10:00, 10:01)
        (ts("2024-01-01 10:00:50"), "A", 8L)) // late, same window
      q.processAllAvailable()
      assert(dropsSoFar == 3L,
        s"same-group late rows collapse to one dropped row, got $dropsSoFar")

      // The observer rode the same batches: all eight normalized rows
      // were SEEN (observation precedes the stateful operator).
      val observed = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("graft_lateness")))
      val rowsIn = observed.map(_.getAs[Long]("rows_in")).sum
      assert(rowsIn == 8L, s"observer must see every arriving row, got $rowsIn")
      // min_ts below the running watermark is the per-batch evidence of
      // lateness a monitor alerts on.
      val minTs = observed.filter(_.getAs[Long]("rows_in") > 0)
        .map(_.getAs[Timestamp]("min_ts")).minBy(_.getTime)
      assert(minTs == ts("2024-01-01 09:59:30"))
    } finally q.stop()
  }

  test("q86 dedup state is watermark-bounded: old ids evict, in-horizon re-deliveries drop") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val events = ms.toDF().toDF("ts", "event_id")
    val deduped = EventStreams.dedupedWithinWatermark(events, "event_id", "1 hour")
    val q = deduped.writeStream
      .format("memory").queryName("dedup_evict_sink").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    def emitted: Long = spark.table("dedup_evict_sink").count()
    def lastStateRows: Long =
      q.recentProgress.toSeq.lastOption
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
    try {
      // Batch 1: ids 1..5 at 10:00, id 1 re-delivered IN-batch → 5 out.
      ms.addData((1L to 5L).map(i => (ts("2024-01-01 10:00:00"), i)) :+
        ((ts("2024-01-01 10:00:00"), 1L)): _*)
      q.processAllAvailable()
      assert(emitted == 5L, s"in-batch re-delivery must dedup, got $emitted")
      // Batch 2: id 3 re-delivered WITHIN the horizon (state still has
      // it — the running watermark is behind 10:00 + 1h) → dropped; ids
      // 6..8 at 13:00 advance the watermark to 12:00 on commit.
      ms.addData((ts("2024-01-01 10:30:00"), 3L),
        (ts("2024-01-01 13:00:00"), 6L), (ts("2024-01-01 13:00:00"), 7L),
        (ts("2024-01-01 13:00:00"), 8L))
      q.processAllAvailable()
      assert(emitted == 8L, s"in-horizon re-delivery must dedup, got $emitted")
      // Batch 3 runs UNDER watermark 12:00 > 10:00 + 1h: every batch-1
      // id (and the 10:30 sighting) is past first-sighting + delay and
      // must LEAVE the store — this is the "state is horizon-bounded,
      // not ever-seen-bounded" claim q86's 100 TB posture rests on.
      ms.addData((ts("2024-01-01 13:30:00"), 9L))
      q.processAllAvailable()
      assert(emitted == 9L)
      val rows = lastStateRows
      // Survivors: ids 6, 7, 8 (expire 14:00) and 9 (expire 14:30) — the
      // five 10:00 ids are gone. Exact expiry bookkeeping differs by a
      // row across provider versions, so pin the bound, not the value.
      assert(rows <= 4L && rows >= 1L,
        s"batch-1 ids must evict once the watermark passes their horizon, state=$rows")
    } finally q.stop()
  }
}
