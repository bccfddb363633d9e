package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EventQueries

/** Edge semantics for the round-10 event operators that the DuckDB oracle
  * exercises only on bulk data: q83's STRICT funnel chain (out-of-order
  * stages must not count, ties must not count) and q82's interval
  * coalesce + grid containment (touching spans merge, endpoints are
  * inclusive, grid bucketing loses no boundary match, multi-cell spans
  * never duplicate).
  */
class FunnelIntervalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(us: Long) = new Timestamp(us / 1000) // whole-ms fixtures

  private def events(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))

  private def stages(rows: (Long, String, Long)*): Map[Long, Long] =
    EventQueries.funnelStages(events(rows: _*))
      .select("user_id", "stage").as[(Long, Long)].collect().toMap

  test("funnel: full strict chain reaches stage 3") {
    assert(stages(
      (1L, "view", 1000000L), (1L, "click", 2000000L),
      (1L, "purchase", 3000000L)) == Map(1L -> 3L))
  }

  test("funnel: click BEFORE the first view does not qualify") {
    // The only click precedes every view -> stage stops at 1.
    assert(stages(
      (1L, "click", 1000000L), (1L, "view", 2000000L)) == Map(1L -> 1L))
  }

  test("funnel: purchase before the qualifying click does not qualify") {
    assert(stages(
      (1L, "view", 1000000L), (1L, "purchase", 2000000L),
      (1L, "click", 3000000L)) == Map(1L -> 2L))
  }

  test("funnel: simultaneous view+click tie is NOT progression (strict >)") {
    assert(stages(
      (1L, "view", 1000000L), (1L, "click", 1000000L)) == Map(1L -> 1L))
  }

  test("funnel: a later second view cannot resurrect an early click") {
    // click at t2 qualifies via the t1 view; the chain uses the FIRST
    // qualifying click, so a purchase between view and click stays out.
    assert(stages(
      (1L, "view", 1000000L), (1L, "purchase", 1500000L),
      (1L, "click", 2000000L), (1L, "view", 2500000L)) == Map(1L -> 2L))
  }

  test("funnel: user with no view at all is stage 0") {
    assert(stages(
      (1L, "signup", 1000000L), (1L, "click", 2000000L)) == Map(1L -> 0L))
  }

  private def intervals(rows: (Long, Long)*) =
    rows.toDF("s_us", "e_us")
      .select(timestamp_micros(col("s_us")).as("s"),
        timestamp_micros(col("e_us")).as("e"))

  private def mergedSpans(rows: (Long, Long)*): Seq[(Long, Long)] =
    EventQueries.mergeIntervals(intervals(rows: _*))
      .select(unix_micros(col("ws")), unix_micros(col("we")))
      .as[(Long, Long)].collect().sorted.toSeq

  test("mergeIntervals: overlapping and touching spans coalesce; gaps split") {
    assert(mergedSpans((0L, 10L), (5L, 20L), (20L, 30L), (40L, 50L)) ==
      Seq((0L, 30L), (40L, 50L)))
  }

  test("mergeIntervals: containment collapses into the outer span") {
    assert(mergedSpans((0L, 100L), (10L, 20L), (30L, 40L)) == Seq((0L, 100L)))
  }

  private def contained(ptsUs: Seq[Long], spans: Seq[(Long, Long)],
      cellUs: Long): Seq[Long] = {
    val pts = ptsUs.toDF("p_us")
      .select(col("p_us"), timestamp_micros(col("p_us")).as("ts"))
    val merged = spans.toDF("ws_us", "we_us")
      .select(timestamp_micros(col("ws_us")).as("ws"),
        timestamp_micros(col("we_us")).as("we"))
    EventQueries.intervalContainedSemi(pts, merged, cellUs)
      .select("p_us").as[Long].collect().sorted.toSeq
  }

  test("intervalContainedSemi: endpoints inclusive, outside-by-1us excluded") {
    assert(contained(Seq(99L, 100L, 150L, 200L, 201L),
      Seq((100L, 200L)), 50L) == Seq(100L, 150L, 200L))
  }

  test("intervalContainedSemi: span crossing many cells matches each point once") {
    // Span [0, 1000] covers 11 cells at width 100; in-span points emit
    // exactly once (left_semi), including cell-boundary points.
    assert(contained(Seq(0L, 100L, 500L, 999L, 1000L, 1001L),
      Seq((0L, 1000L)), 100L) == Seq(0L, 100L, 500L, 999L, 1000L))
  }

  test("q86 injection is non-vacuous: without the dedup the counts inflate") {
    // The oracle hash-match proves dedup removed every re-delivery; this
    // proves there was something to remove — the same at-least-once
    // union WITHOUT dropDuplicatesWithinWatermark must overcount.
    val dir = "/root/testdata/sf0.001"
    val spark2 = SparkTestSession.spark
    val nDup = graft.sources.Tables(spark2, dir, "events")
      .filter(col("event_id") % 7 === 0).count()
    assert(nDup > 0, "fixture must contain event_id % 7 == 0 rows")
    val ss = graft.streaming.EventStreams.streamSession(spark2)
    val events = graft.streaming.EventStreams.fileReplaySource(ss, dir)
    val atLeastOnce = events.unionByName(events.filter(col("event_id") % 7 === 0))
    val noDedup = graft.streaming.EventStreams.runToMemory(spark2,
      atLeastOnce.withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("win_start"), col("event_type"), col("n_events")))
      .agg(sum("n_events")).as[Long].collect().head
    val withDedup = graft.queries.StreamQueries
      .q86StreamDedupIngest(spark2, dir)
      .agg(sum("n_events")).as[Long].collect().head
    assert(noDedup > withDedup,
      s"no-dedup total $noDedup must exceed deduped total $withDedup")
  }

  test("intervalContainedSemi: agrees with brute force on random spans") {
    val rnd = new scala.util.Random(7)
    val spans = Seq.fill(20)(rnd.nextInt(10000).toLong)
      .map(s => (s, s + 1 + rnd.nextInt(700).toLong))
    val pts = Seq.fill(300)(rnd.nextInt(11000).toLong)
    val expected = pts.filter(p => spans.exists(w => p >= w._1 && p <= w._2))
      .sorted
    val merged = EventQueries.mergeIntervals(intervals(spans: _*))
      .select(unix_micros(col("ws")), unix_micros(col("we")))
      .as[(Long, Long)].collect().toSeq
    assert(contained(pts, merged, 256L) == expected,
      s"grid containment diverged from brute force over spans $spans")
  }
}
