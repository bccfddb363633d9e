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
}
