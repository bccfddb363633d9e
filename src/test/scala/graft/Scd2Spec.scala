package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EventQueries

/** q137 SCD2 build: consecutive identical states collapse into one
  * version, validity intervals tile the timeline exactly, the open
  * interval closes at the high watermark, and duplicate timestamps
  * resolve deterministically through the event_id tie-break. */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("A,A,B,B,A collapses to three tiling versions") {
    val ev = Seq(
      (1L, ts(1), 10L, "A"), (1L, ts(2), 11L, "A"), (1L, ts(3), 12L, "B"),
      (1L, ts(4), 13L, "B"), (1L, ts(5), 14L, "A"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventQueries.scd2(ev, "user_id", "event_type")
      .orderBy("version")
      .collect().map(r => (r.getString(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getLong(4), r.getBoolean(5)))
    val hwm = Timestamp.valueOf("2200-01-01 00:00:00")
    assert(got.toList == List(
      ("A", ts(1), ts(3), 1L, false),
      ("B", ts(3), ts(5), 2L, false),
      ("A", ts(5), hwm, 3L, true)))
  }

  test("duplicate timestamps order by event_id: last write wins the run") {
    val ev = Seq(
      (1L, ts(1), 20L, "A"), (1L, ts(1), 21L, "B"), (1L, ts(2), 22L, "B"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventQueries.scd2(ev, "user_id", "event_type")
      .orderBy("version")
      .collect().map(r => (r.getString(1), r.getLong(4)))
    // (ts1, id20)=A then (ts1, id21)=B then (ts2, id22)=B collapses
    assert(got.toList == List(("A", 1L), ("B", 2L)))
  }

  test("q137 tiles each user's timeline with no gaps or overlaps") {
    val out = EventQueries.scd2(
      graft.sources.Tables(spark, "/root/testdata/sf0.001", "events"),
      "user_id", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    val bad = out
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull &&
        col("next_from") =!= col("valid_to"))
      .count()
    assert(bad == 0, s"$bad versions whose valid_to misses the next valid_from")
  }
}
