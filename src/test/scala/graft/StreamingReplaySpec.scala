package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Streaming-semantics parity tests (SURVEY §2.9, VERDICT r1 item 1):
  *   1. deterministic file replay == the oracle-checked batch answer on the
  *      same events slice (closed windows only),
  *   2. 0-second watermark drops late data at window close (no grace —
  *      AirlineAircraftCountStream.java:38),
  *   3. append mode emits each window exactly once, final value only
  *      (suppress(untilWindowCloses) parity — :48).
  */
class StreamingReplaySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("file replay equals the batch windowed-distinct answer (closed windows)") {
    import spark.implicits._
    val streamed = graft.queries.StreamQueries
      .q32StreamWindowedDistinct(spark, sf)
      .select("win_start", "event_type", "distinct_users")
      .as[(String, String, Long)].collect().toSet

    val ev = graft.sources.Tables(spark, sf, "events")
    val maxTs = ev.agg(max("ts")).collect().head.getTimestamp(0)
    val batch = ev
      .groupBy(window(col("ts"), "1 minute"), lower(trim(col("event_type"))).as("event_type"))
      .agg(countDistinct("user_id").as("distinct_users"))
      .filter(col("window.end") <= lit(maxTs))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("distinct_users"))
      .as[(String, String, Long)].collect().toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("0s watermark drops late events; append emits each window once, final-only") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Long)]
    val events = ms.toDF().toDF("ts", "event_type", "user_id")
    val counts = EventStreams.windowedDistinct(
      EventStreams.normalize(events), col("event_type"), "event_type")
    val q = counts.writeStream
      .format("memory").queryName("late_drop_sink").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // Batch 1: two users in window [10:00, 10:01), one in [10:01, ...)
      ms.addData((ts("2024-01-01 10:00:10"), "A", 1L), (ts("2024-01-01 10:00:40"), "A", 2L),
        (ts("2024-01-01 10:01:05"), "A", 3L))
      q.processAllAvailable()
      // Batch 2: a LATE arrival for the already-passed 10:00 window (must be
      // dropped — no grace), plus an event advancing past 10:02.
      ms.addData((ts("2024-01-01 10:00:30"), "A", 9L), (ts("2024-01-01 10:02:10"), "A", 4L))
      q.processAllAvailable()
      // Batch 3: advance watermark past 10:03 so [10:02, 10:03) also closes.
      ms.addData((ts("2024-01-01 10:03:20"), "A", 5L))
      q.processAllAvailable()

      val deadline = System.currentTimeMillis() + 15000
      def rows() = spark.table("late_drop_sink")
        .select("win_start", "event_type", "distinct_users")
        .as[(String, String, Long)].collect().toSeq
      while (rows().size < 3 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(100)
      }
      val out = rows()
      // exactly-once emission per window
      assert(out.map(r => (r._1, r._2)).distinct.size == out.size)
      val byWin = out.map(r => r._1 -> r._3).toMap
      assert(byWin("2024-01-01 10:00:00") == 2L,
        s"late event must NOT be counted; got $out") // u9 dropped, u1+u2 kept
      assert(byWin("2024-01-01 10:01:00") == 1L)
      assert(byWin("2024-01-01 10:02:00") == 1L)
    } finally q.stop()
  }

  test("sliding windows: each event in two windows; lateness is PER WINDOW, not per row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Long)]
    val events = ms.toDF().toDF("ts", "event_type", "user_id")
    val counts = EventStreams.slidingCounts(EventStreams.normalize(events))
    val q = counts.writeStream
      .format("memory").queryName("sliding_sink").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // Batch 1: wm ends at 10:01:05 → closes [09:59, 10:01).
      ms.addData((ts("2024-01-01 10:00:10"), "A", 1L), (ts("2024-01-01 10:00:40"), "A", 2L),
        (ts("2024-01-01 10:01:05"), "A", 3L))
      q.processAllAvailable()
      // Batch 2: u9@10:00:30 arrives with wm = 10:01:05 — LATE for its
      // older window [09:59, 10:01) (already closed) but ON TIME for
      // [10:00, 10:02): the overlap means a row can be dropped for one of
      // its windows and still count in the other. u4 advances wm to 10:02:10.
      ms.addData((ts("2024-01-01 10:00:30"), "A", 9L), (ts("2024-01-01 10:02:10"), "A", 4L))
      q.processAllAvailable()
      // Batch 3: advance wm to 10:04:30 → closes every window through
      // [10:02, 10:04).
      ms.addData((ts("2024-01-01 10:04:30"), "A", 5L))
      q.processAllAvailable()

      val deadline = System.currentTimeMillis() + 15000
      def rows() = spark.table("sliding_sink")
        .select("win_start", "event_count", "distinct_users")
        .as[(String, Long, Long)].collect().toSeq
      while (rows().size < 4 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(100)
      }
      val out = rows()
      assert(out.map(_._1).distinct.size == out.size, s"duplicate window emission: $out")
      val byWin = out.map(r => r._1 -> ((r._2, r._3))).toMap
      assert(byWin("2024-01-01 09:59:00") == ((2L, 2L)), s"u9 must NOT reopen the closed window: $out")
      assert(byWin("2024-01-01 10:00:00") == ((4L, 4L)), s"late u9 must still count in its open window: $out")
      assert(byWin("2024-01-01 10:01:00") == ((2L, 2L)), s"$out")
      assert(byWin("2024-01-01 10:02:00") == ((1L, 1L)), s"$out")
    } finally q.stop()
  }

  test("flatMapGroupsWithState custom state equals the declarative windowed distinct") {
    import spark.implicits._
    val source = EventStreams.fileReplaySource(spark, sf)
    val declarative = EventStreams.runToMemory(spark,
      EventStreams.windowedDistinct(source, col("event_type"), "event_type"))
      .select("win_start", "event_type", "distinct_users")
      .as[(String, String, Long)].collect().toSet
    val custom = EventStreams.runToMemory(spark,
      EventStreams.windowedDistinctCustomState(
        EventStreams.fileReplaySource(spark, sf), "event_type"))
      .select("win_start", "event_type", "distinct_users")
      .as[(String, String, Long)].collect().toSet
    assert(custom == declarative)
    assert(custom.nonEmpty)
  }

  test("transformWithState (Spark 4 successor API) equals the declarative windowed distinct") {
    import spark.implicits._
    val declarative = EventStreams.runToMemory(spark,
      EventStreams.windowedDistinct(
        EventStreams.fileReplaySource(spark, sf), col("event_type"), "event_type"))
      .select("win_start", "event_type", "distinct_users")
      .as[(String, String, Long)].collect().toSet
    // transformWithState only runs on the RocksDB state-store provider.
    val ss = EventStreams.streamSession(spark, rocksDbState = true)
    val tws = EventStreams.runToMemory(spark,
      EventStreams.windowedDistinctTws(
        EventStreams.fileReplaySource(ss, sf), "event_type"))
      .select("win_start", "event_type", "distinct_users")
      .as[(String, String, Long)].collect().toSet
    assert(tws == declarative)
    assert(tws.nonEmpty)
  }

  test("session windows merge across micro-batches and close on watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Long)]
    val events = ms.toDF().toDF("ts", "event_type", "user_id")
    val sessions = EventStreams.normalize(events)
      .withWatermark("ts", "0 seconds")
      .groupBy(org.apache.spark.sql.functions.session_window(
        org.apache.spark.sql.functions.col("ts"), "10 minutes"),
        org.apache.spark.sql.functions.col("user_id"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_events"))
      .selectExpr("date_format(session_window.start, 'HH:mm:ss') AS s",
        "date_format(session_window.end, 'HH:mm:ss') AS e", "user_id", "n_events")
    val q = sessions.writeStream
      .format("memory").queryName("session_sink").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // Batch 1: two events 5 min apart (same session, gap 10 min).
      ms.addData((ts("2024-01-01 10:00:00"), "A", 1L), (ts("2024-01-01 10:05:00"), "A", 1L))
      q.processAllAvailable()
      // Batch 2: a third event 8 min later EXTENDS the same session across
      // the batch boundary; a far-future event closes it.
      ms.addData((ts("2024-01-01 10:13:00"), "A", 1L), (ts("2024-01-01 12:00:00"), "A", 9L))
      q.processAllAvailable()

      val deadline = System.currentTimeMillis() + 15000
      def rows() = spark.table("session_sink")
        .select("s", "e", "user_id", "n_events")
        .as[(String, String, Long, Long)].collect().toSeq
      while (rows().isEmpty && System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(100)
      }
      // one merged session: [10:00, 10:23) with all 3 events
      assert(rows() == Seq(("10:00:00", "10:23:00", 1L, 3L)), s"got ${rows()}")
    } finally q.stop()
  }

  test("ingest dedup drops within-watermark re-deliveries across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Long, String)]
    val events = ms.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val deduped = EventStreams.dedupedWithinWatermark(
      EventStreams.normalize(events), "event_id", "10 minutes")
    val q = deduped.writeStream
      .format("memory").queryName("dedup_sink").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: event 1 plus an in-batch duplicate
      ms.addData((1L, ts("2024-01-01 10:00:00"), 7L, "A"),
        (1L, ts("2024-01-01 10:00:00"), 7L, "A"))
      q.processAllAvailable()
      // batch 2: a RETRY of event 1 within the 10-minute delay (dropped)
      // and a fresh event 2
      ms.addData((1L, ts("2024-01-01 10:00:05"), 7L, "A"),
        (2L, ts("2024-01-01 10:03:00"), 7L, "A"))
      q.processAllAvailable()
      val out = spark.table("dedup_sink")
        .select("event_id").as[Long].collect().toSeq.sorted
      assert(out == Seq(1L, 2L), s"got $out")
    } finally q.stop()
  }

  test("stream-stream join matches across micro-batch boundaries, bounded by range") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vs = MemoryStream[(Timestamp, Long, Long)]
    val ps = MemoryStream[(Timestamp, Long, Long)]
    val views = vs.toDF().toDF("view_ts", "user_id", "view_id")
      .withWatermark("view_ts", "0 seconds")
    val purchases = ps.toDF().toDF("purchase_ts", "p_user_id", "purchase_id")
      .withWatermark("purchase_ts", "0 seconds")
    val joined = views.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") > col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 2 HOURS"))
      .select("view_id", "purchase_id")
    val q = joined.writeStream
      .format("memory").queryName("ss_join_sink").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      vs.addData((ts("2024-01-01 10:00:00"), 1L, 100L))
      q.processAllAvailable()
      // the matching purchase arrives a BATCH LATER: found via buffered state
      ps.addData((ts("2024-01-01 10:30:00"), 1L, 200L))
      q.processAllAvailable()
      // outside the 2h range and a different user: neither may match
      ps.addData((ts("2024-01-01 13:30:00"), 1L, 201L),
        (ts("2024-01-01 10:40:00"), 2L, 202L))
      q.processAllAvailable()
      val out = spark.table("ss_join_sink")
        .select("view_id", "purchase_id").as[(Long, Long)].collect().toSet
      assert(out == Set((100L, 200L)), s"got $out")
    } finally q.stop()
  }

  test("left-outer stream-stream join: null-padded rows emit only on watermark eviction") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vs = MemoryStream[(Timestamp, Long, Long)]
    val ps = MemoryStream[(Timestamp, Long, Long)]
    val views = vs.toDF().toDF("view_ts", "user_id", "view_id")
      .withWatermark("view_ts", "0 seconds")
    val purchases = ps.toDF().toDF("purchase_ts", "p_user_id", "purchase_id")
      .withWatermark("purchase_ts", "0 seconds")
    val joined = views.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") > col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 2 HOURS"),
      "left_outer")
      .select(col("view_id"), col("purchase_id"))
    val q = joined.writeStream
      .format("memory").queryName("ss_louter_sink").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      def rows() = spark.table("ss_louter_sink")
        .select(col("view_id"), col("purchase_id"))
        .as[(Long, Option[Long])].collect().toSet
      // Batch 1: view 100 (u1) will match later; view 101 (u2) never does.
      vs.addData((ts("2024-01-01 10:00:00"), 1L, 100L),
        (ts("2024-01-01 10:00:00"), 2L, 101L))
      q.processAllAvailable()
      // Batch 2: the matching purchase arrives a batch later — the inner
      // row emits from buffered state, but 101 must NOT null-pad yet: the
      // watermark (10:00) is still below its eviction point (12:00).
      ps.addData((ts("2024-01-01 10:30:00"), 1L, 200L))
      q.processAllAvailable()
      assert(rows() == Set((100L, Some(200L))),
        s"no null-padding before eviction; got ${rows()}")
      // Batch 3: advance BOTH sides past 12:00 so the global watermark
      // (min of the two) passes view_ts + 2h — 101 is evicted and only
      // now emits null-padded. (13:00 purchase fails ts-range vs 13:00
      // view, so neither new row matches or evicts here.)
      vs.addData((ts("2024-01-01 13:00:00"), 9L, 999L))
      ps.addData((ts("2024-01-01 13:00:00"), 9L, 998L))
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 15000
      while (!rows().contains((101L, None)) && System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(100)
      }
      assert(rows().contains((101L, None)),
        s"evicted unmatched view must emit null-padded; got ${rows()}")
      assert(!rows().exists(r => r._1 == 100L && r._2.isEmpty),
        "a matched view must never also null-pad")
    } finally q.stop()
  }

  test("upsert merge is associative — result independent of batch slicing") {
    import spark.implicits._
    val all = Seq(
      ("a", "2024-01-01 10:00:00", 2L), ("a", "2024-01-01 10:01:00", 3L),
      ("b", "2024-01-01 10:00:00", 1L), ("b", "2024-01-01 10:02:00", 5L),
      ("c", "2024-01-01 10:01:00", 4L))
    def df(rows: Seq[(String, String, Long)]) =
      rows.toDF("event_type", "win_start", "distinct_users")
    val empty = df(all).limit(0)
    def result(d: org.apache.spark.sql.DataFrame) =
      d.as[(String, String, Long)].collect().toSet
    val oneShot = result(EventStreams.upsertMerge(empty, df(all), "event_type"))
    assert(oneShot == Set(
      ("a", "2024-01-01 10:01:00", 3L),
      ("b", "2024-01-01 10:02:00", 5L),
      ("c", "2024-01-01 10:01:00", 4L)))
    // every contiguous 2-way slicing, plus an interleaved one
    val slicings = (1 until all.size).map(i => Seq(all.take(i), all.drop(i))) :+
      Seq(Seq(all(1), all(3)), Seq(all(0), all(2), all(4)))
    slicings.foreach { slices =>
      val folded = slices.foldLeft(empty) { (acc, s) =>
        EventStreams.upsertMerge(acc, df(s), "event_type") }
      assert(result(folded) == oneShot, s"slicing $slices diverged")
    }
  }

  test("upsert sink merges executor-side into a versioned parquet store") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Long)]
    val events = ms.toDF().toDF("ts", "event_type", "user_id")
    ms.addData(
      (ts("2024-01-01 10:00:10"), "A", 1L), (ts("2024-01-01 10:00:20"), "A", 2L),
      (ts("2024-01-01 10:01:05"), "A", 1L), (ts("2024-01-01 10:00:30"), "B", 7L),
      (ts("2024-01-01 10:02:30"), "A", 9L)) // advances watermark; its window stays open
    val counts = EventStreams.windowedDistinct(
      EventStreams.normalize(events), col("event_type"), "event_type")
    val storeDir = "target/upsert-store/spec"
    val out = EventStreams
      .runUpsertLastWindowWins(spark, counts, "event_type", storeDir)
      .select("event_type", "win_start", "distinct_users")
      .as[(String, String, Long)].collect().toSet
    // last CLOSED window per key wins; [10:02, 10:03) never closes
    assert(out == Set(
      ("a", "2024-01-01 10:01:00", 1L),
      ("b", "2024-01-01 10:00:00", 1L)), s"got $out")
    // the store is on-disk parquet snapshots, not driver memory
    val versions = new java.io.File(storeDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
    assert(versions.nonEmpty)
  }

  test("enrich attaches static lookups and serializes executor-side JSON") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, String, String)]
    val events = ms.toDF().toDF("ts", "user_id", "event_type", "props")
    val registry = Seq((3L, "REG3")).toDF("reg_key", "reg_name")
    val typeInfo = Seq(("a", 42L)).toDF("event_type", "type_count")
    val enriched = EventStreams.enrich(
      EventStreams.normalize(events).withColumn("event_id", col("user_id")),
      registry, typeInfo)
    val q = enriched.writeStream
      .format("memory").queryName("enrich_sink").outputMode("append").start()
    try {
      ms.addData((ts("2024-01-01 10:00:10"), 3L, "A", """{"k": 7}"""))
      q.processAllAvailable()
      val row = spark.table("enrich_sink")
        .select("event_type", "reg_name", "type_count", "k", "enriched")
        .collect().head
      assert(row.getString(0) == "a") // P8 normalize lower-cased the key
      assert(row.getString(1) == "REG3") // J6: user_id 3 % 25 -> reg 3
      assert(row.getLong(2) == 42L) // J7 via extracted payload key
      assert(row.getLong(3) == 7L) // P9 JSON field extraction
      val json = row.getString(4)
      assert(json.contains(""""reg_name":"REG3"""") && json.contains(""""k":7""")) // P10
    } finally q.stop()
  }

  test("q124: the quality-gate census accumulates across micro-batches (complete mode)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, String)]
    val docs = ms.toDF().toDF("doc_id", "source", "text")
    val t = split(lower(trim(col("text"))), "\\s+")
    val census = docs.select(col("source"),
        size(t).cast("long").as("n_tokens"))
      .withColumn("verdict",
        when(col("n_tokens") < 16, lit("too_short")).otherwise(lit("kept")))
      .groupBy("source", "verdict")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"))
    val q = census.writeStream
      .format("memory").queryName("gate_census_sink").outputMode("complete")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      val long = (1 to 20).map(i => s"w$i").mkString(" ")
      // Batch 1: one short doc in src0, one long in src1.
      ms.addData((1L, "src0", "a b c"), (2L, "src1", long))
      q.processAllAvailable()
      // Batch 2: another short doc in src0 — its census row must UPDATE
      // (state is sources × verdicts, not per doc), plus a long doc in a
      // brand-new source.
      ms.addData((3L, "src0", "d e"), (4L, "src2", long))
      q.processAllAvailable()
      val out = spark.table("gate_census_sink")
        .select("source", "verdict", "n_docs", "tokens")
        .as[(String, String, Long, Long)].collect().toSet
      assert(out == Set(
        ("src0", "too_short", 2L, 5L),
        ("src1", "kept", 1L, 20L),
        ("src2", "kept", 1L, 20L)), s"census diverged: $out")
    } finally q.stop()
  }
}
