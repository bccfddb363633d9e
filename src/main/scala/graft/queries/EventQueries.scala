package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.core._
import graft.sources.Tables

/** Event-table queries: JSON extraction and the batch form of the streaming
  * windowed distinct counts (SURVEY §2.9). These batch forms double as the
  * ground truth the Structured Streaming replays are asserted against.
  */
object EventQueries {

  /** P9 JSON field extraction (StreamProcessor.java:70-183 does this with
    * Jackson by hand; Spark-native is get_json_object / from_json). */
  def q16JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    ev.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("event_count"),
        round(avg(col("k")), 4).as("avg_k"),
        round(avg(col("value")), 4).as("avg_value"))
      .orderBy(asc("event_type"))
  }

  /** A14 windowed exact distinct count, batch form
    * (AirlineAircraftCountStream.java:34-52: per (airline, 1-min tumbling
    * window) HashSet of icao24 → size). Exact distinct for parity;
    * approx_count_distinct is the documented scale escape hatch. */
  def q17WindowedDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    ev.groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("distinct_users"))
      .filter(col("distinct_users") >= 2)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("distinct_users"))
      .orderBy(asc("win_start"), asc("event_type"))
  }

  /** AS-OF JOIN (q58): for every click, the most recent view by the same
    * user at or before the click — attribution's last-touch primitive,
    * and the classic trade/quote as-of shape re-expressed Spark-first via
    * [[graft.ops.core.asofJoin]]'s union-and-sweep plan (one key-hash
    * shuffle + per-partition sort, no range-pair explosion; the scaladoc
    * there has the 100 TB cost argument). Views are deduplicated per
    * (user, ts) upstream (keep max event_id) so the as-of pick is total,
    * and the gap is exact integer microseconds — both mirrored in the
    * DuckDB oracle, which states the SAME semantics through its native
    * `ASOF LEFT JOIN` operator, so the two plans confirm each other from
    * independent implementations. */
  def q58AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val (clicks, views) = asofInputs(spark, dir)
    asofProject(asofJoin(clicks, views, Seq("user_id"), "ts", "view_ts"))
  }

  /** AS-OF JOIN, skew-salted (q64): the identical attribution question
    * answered through [[graft.ops.core.asofJoinSalted]] with daily time
    * buckets — each user's timeline splits across (user, day) window
    * partitions with the previous day's last view carried over, so one
    * hyperactive user no longer serializes a task. Registered against
    * the SAME DuckDB `ASOF LEFT JOIN` oracle as q58: the salted plan must
    * land on bit-identical output (its carries keep true timestamps, so
    * even the derived gap survives). */
  def q64AsofJoinSalted(spark: SparkSession, dir: String): DataFrame = {
    val (clicks, views) = asofInputs(spark, dir)
    asofProject(asofJoinSalted(clicks, views, Seq("user_id"), "ts", "view_ts",
      t => floor(unix_micros(t) / lit(86400000000L))))
  }

  private def asofInputs(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = Tables(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id"))
      .groupBy("user_id", "view_ts")
      .agg(max(col("event_id")).as("view_event_id"))
    (clicks, views)
  }

  private def asofProject(joined: DataFrame): DataFrame =
    joined.select(
      col("event_id"), col("user_id"), col("view_event_id"),
      (unix_micros(col("ts")) - unix_micros(col("view_ts"))).as("gap_us"))
      .orderBy(asc("event_id"))

  /** Batch sessionization (q61): gap-based sessions as window functions —
    * lag to flag gaps ≥ 6 h, a cumulative sum (explicit ROWS frame, both
    * engines) to number the islands, then one aggregate per (user,
    * session). The batch twin of q37's streaming `session_window`, with
    * the same session-start convention (new session at gap ≥ threshold)
    * and the same normalize guards, but reporting actual last-event time
    * (batch has no watermark, so no `+gap` close and no open-session
    * exclusion — the two queries answer different operational questions
    * and check each other's gap logic through their shared oracle shape).
    *
    * Scale shape: ONE hash exchange on user_id — the window's
    * partitioning also satisfies the downstream groupBy(user_id, sid)
    * clustering (a strict subset co-locates the superset), so Spark plans
    * no second exchange (PlanPinsSpec pins it). Per-key window state is
    * one lag value and one running sum — nothing material even on a
    * million-event user. */
  def q61BatchSessionize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .filter(col("event_type").isNotNull &&
        length(trim(col("event_type"))) > 0 &&
        col("ts").isNotNull && col("user_id").isNotNull)
    val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapUs = lit(6L * 3600L * 1000000L)
    val flagged = ev.withColumn("new_s",
      when(lag(col("ts"), 1).over(byTime).isNull ||
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byTime)) >= gapUs,
        1L).otherwise(0L))
    val numbered = flagged.withColumn("sid",
      sum(col("new_s")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    numbered.groupBy(col("user_id"), col("sid"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        count(lit(1)).as("n_events"),
        // Exact-integer mean, NO final round: double avg() is
        // accumulation-order sensitive (partial sums differ by ulps
        // between engines), and round(double, 4) itself disagrees across
        // engines at half-way boundaries (Spark rounds the shortest
        // decimal rendering, DuckDB the binary value) — integer-cent
        // quotients hit those boundaries constantly. Summing integer
        // cents is associative-exact and the single final division is
        // the same IEEE op in both engines, so the doubles are
        // bit-identical with nothing to repair.
        sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"))
      .withColumn("avg_value",
        col("sum_cents").cast("double") / (col("n_events") * 100.0))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("avg_value"))
      .orderBy(asc("user_id"), asc("session_start"))
  }

  /** A14/A15 at scale: same window keyed by the J8 geo match, with
    * approx_count_distinct — demonstrates the documented approximate path
    * (exact HashSet state does not bound memory per key at 100 TB).
    * No oracle (HLL is engine-specific) → driver rows-only check.
    *
    * Precision: the default rsd (0.05) on purpose. This query IS the scale
    * escape hatch, so its cost story must be good: HLL sketch width grows
    * ~1/rsd², and rsd=0.01 made each (key, window) sketch 25× wider for a
    * 4× slower aggregate (8.9 s vs ~2 s at sf0.1) — a ±5% count on a
    * monitoring-style distinct is the right trade. Callers needing tighter
    * error pay for it explicitly via the rsd argument. The error is
    * MEASURED against the exact path and pinned (ApproxDistinctSpec):
    * mean 2.5% over 3392 groups at sf0.1, worst 2.0% where counts ≥ 50 —
    * within the documented rsd. */
  def q18WindowedApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("approx_users"))
      .orderBy(asc("win_start"), asc("event_type"))
  }
}
