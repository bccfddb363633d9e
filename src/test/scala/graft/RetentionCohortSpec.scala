package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EventQueries

/** q151 retention cohorts: exact triangle on a planted comeback pattern
  * — cohorts keyed by FIRST week, later-week actives counted once per
  * user however many events they fire, users never counted into a
  * cohort they didn't start in. */
class RetentionCohortSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Mondays: 2024-01-01, 2024-01-08, 2024-01-15
  private def ts(day: Int, h: Int = 9) =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  /** cohort W1 = {1, 2, 3}: user 1 active all three weeks, user 2 skips
    * W2 and RETURNS in W3 (the comeback retention must catch), user 3
    * never returns; cohort W2 = {4}: user 4 fires MANY events in W2
    * (must count once) and returns in W3. */
  private def events = Seq(
    (1L, ts(1)), (1L, ts(9)), (1L, ts(16)),
    (2L, ts(2)), (2L, ts(17)),
    (3L, ts(3)),
    (4L, ts(8)), (4L, ts(8, 10)), (4L, ts(10)), (4L, ts(15)))
    .toDF("user_id", "ts")

  test("the triangle is exact: counts, cohorts, and comebacks") {
    val got = EventQueries.retentionCohorts(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toList
    assert(got == List(
      ("2024-01-01", "2024-01-01", 3L, 3L, 1000000L),
      ("2024-01-01", "2024-01-08", 1L, 3L, 333333L),
      ("2024-01-01", "2024-01-15", 2L, 3L, 666666L),
      ("2024-01-08", "2024-01-08", 1L, 1L, 1000000L),
      ("2024-01-08", "2024-01-15", 1L, 1L, 1000000L)))
  }

  test("triangle is invariant under partitioning and event duplication") {
    val ref = EventQueries.retentionCohorts(events)
      .collect().map(_.toSeq).toList
    val doubled = events.unionByName(events)
    for (df <- Seq(events.repartition(7), doubled)) {
      val got = EventQueries.retentionCohorts(df)
        .collect().map(_.toSeq).toList
      assert(got == ref)
    }
  }
}
