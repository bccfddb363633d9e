package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EventQueries

/** q145 incremental SCD2 maintenance: the load-bearing property is that
  * folding an arrival batch into a standing dimension EQUALS rebuilding
  * from all events — that equality is why q145's registered oracle is
  * q137's rebuild SQL verbatim. Pinned here as frame equality on a
  * fixture exercising every key shape (multi-change, unchanged-state,
  * untouched, brand-new), then as a cutoff sweep over the real sf0.001
  * events table. The load-boundary contract (batch ts at or after the
  * standing events per key) is enforced, not assumed — the violation
  * test pins the raise. */
class Scd2IncrementalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  /** Fixture: four standing keys + one brand-new batch key.
    *  key 1: multi-change history (A,B), batch flips twice more (C,B)
    *  key 2: history A,A — batch arrives with the SAME state (no change:
    *         the open version must stay open, version count unchanged)
    *  key 3: history only, batch never mentions it (must pass through
    *         bit-identically, including is_current)
    *  key 4: brand-new in the batch (first row opens version 1)
    */
  private def history = Seq(
    (1L, ts(1), 10L, "A"), (1L, ts(2), 11L, "B"),
    (2L, ts(1), 20L, "A"), (2L, ts(3), 21L, "A"),
    (3L, ts(2), 30L, "X"), (3L, ts(4), 31L, "Y"))
    .toDF("user_id", "ts", "event_id", "event_type")

  private def batch = Seq(
    (1L, ts(10), 12L, "C"), (1L, ts(12), 13L, "B"),
    (2L, ts(11), 22L, "A"),
    (4L, ts(10), 40L, "N"), (4L, ts(11), 41L, "M"))
    .toDF("user_id", "ts", "event_id", "event_type")

  private def canon(df: DataFrame) =
    df.select("user_id", "state", "valid_from", "valid_to", "version",
        "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getLong(4), r.getBoolean(5)))
      .sortBy(t => (t._1, t._5)).toList

  test("incremental fold equals from-scratch rebuild on every key shape") {
    val got = canon(EventQueries.scd2Incremental(
      EventQueries.scd2(history, "user_id", "event_type"),
      batch, key = "user_id", state = "event_type"))
    val want = canon(EventQueries.scd2(
      history.unionByName(batch), "user_id", "event_type"))
    assert(got == want)
    // and the shapes are the ones the fixture was built to exercise:
    val byKey = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byKey == Map(1L -> 4, 2L -> 1, 3L -> 2, 4L -> 2))
    assert(got.count(_._6) == 4, "exactly one open version per key")
  }

  test("same-state batch leaves the open version open and unversioned") {
    val out = canon(EventQueries.scd2Incremental(
      EventQueries.scd2(history, "user_id", "event_type"),
      batch, key = "user_id", state = "event_type"))
    val k2 = out.filter(_._1 == 2L)
    assert(k2 == List((2L, "A", ts(1),
      Timestamp.valueOf("2200-01-01 00:00:00"), 1L, true)))
  }

  test("cutoff sweep on real events: fold ≡ rebuild at every boundary") {
    val events = graft.sources.Tables(spark, "/root/testdata/sf0.001",
      "events")
    for (day <- Seq("2024-01-08", "2024-01-15", "2024-01-22")) {
      val cutoff = to_timestamp(lit(s"$day 00:00:00"))
      val got = EventQueries.scd2Incremental(
        EventQueries.scd2(events.filter(col("ts") < cutoff),
          "user_id", "event_type"),
        events.filter(col("ts") >= cutoff),
        key = "user_id", state = "event_type")
      val want = EventQueries.scd2(events, "user_id", "event_type")
      val diff = got.exceptAll(want).count() + want.exceptAll(got).count()
      assert(diff == 0, s"fold diverged from rebuild at cutoff $day")
    }
  }

  test("load-boundary violation raises instead of minting overlap") {
    // batch row for key 1 BEFORE the open version's valid_from (ts 2)
    val bad = Seq((1L, ts(1), 99L, "Z"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val ex = intercept[Exception] {
      EventQueries.scd2Incremental(
        EventQueries.scd2(history, "user_id", "event_type"),
        bad, key = "user_id", state = "event_type").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("load-boundary")),
      s"expected the named guard, got: ${ex.getMessage}")
  }
}
