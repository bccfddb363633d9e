package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.core._
import graft.sources.Tables

/** Second batch of parity queries: buckets, scalable global-scalar join,
  * string unpivot, mode-ranking, dedup-join + normalization, multi-level dim
  * enrichment, scalar-function surface, geo theta join, distinct projection.
  */
object BatchQueries2 {

  /** W3+A7 distance-delay-correlation shape (batch_process.py:160-180):
    * bucketize a numeric measure (when-chain, no MLlib), conditional count
    * per bucket → P(delay). */
  def q07PriceBuckets(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val splits = Seq(0.0, 10000.0, 20000.0, 30000.0, 40000.0, 50000.0)
    val (id, label) = bucketize(col("l_extendedprice"), splits)
    li.withColumn("bucket_id", id).withColumn("bucket_label", label)
      .groupBy("bucket_id", "bucket_label")
      .agg(
        countIf(col("l_discount") > 0.05).as("delayed_count"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        count(lit(1)).as("flight_count"))
      .filter(col("flight_count") > 10)
      .withColumn("delay_probability",
        round(col("delayed_count").cast("double") / col("flight_count"), 6))
      .drop("delayed_count")
      .orderBy(asc("bucket_id"))
  }

  /** A8+A9 problematic-routes shape (batch_process.py:186-207). The
    * reference collect()s the overall delay pct to the driver and re-injects
    * it as a literal; at 100 TB that is replaced by a 1-row-agg broadcast
    * crossJoin, which stays fully distributed with identical semantics. */
  def q08ProblematicRoutes(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val overall = li.agg(
      (countIf(col("l_discount") > 0.05).cast("double") / count(lit(1)) * 100.0)
        .as("_overall_pct"))
    li.groupBy(col("l_returnflag").as("origin_code"), col("l_linestatus").as("dest_code"))
      .agg(
        count(lit(1)).as("flight_count"),
        countIf(col("l_discount") > 0.05).as("delayed_count"))
      .filter(col("flight_count") > 10)
      .crossJoin(broadcast(overall))
      .withColumn("route", concat(col("origin_code"), lit("-"), col("dest_code")))
      .withColumn("problematic_score",
        round(when(col("_overall_pct") > 0,
          pctOf(col("delayed_count"), col("flight_count")) / col("_overall_pct"))
          .otherwise(1.0), 6))
      .filter(col("problematic_score") >= 0.5)
      .select("route", "origin_code", "dest_code", "flight_count", "problematic_score")
      .orderBy(desc("problematic_score"), asc("route"))
  }

  /** O7+A10 diverted-airports shape (batch_process.py:216-232): unpivot N
    * string columns to rows, blank-filter, count by value. */
  def q09AttrUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
    unpivot(p,
      Seq("brand" -> "p_brand", "type" -> "p_type", "name" -> "p_name"),
      keyName = "attr", valueName = "attr_value")
      .filter(col("attr_value").isNotNull && trim(col("attr_value")) =!= "")
      .groupBy("attr", "attr_value")
      .agg(count(lit(1)).as("value_count"))
      .filter(col("value_count") > 5)
      .orderBy(desc("value_count"), asc("attr"), asc("attr_value"))
  }

  /** A11+W2+J4 mode-ranking shape (flights_lookup_to_kafka.py:30-48): per
    * key, the most frequent value via groupBy-count + row_number with a total
    * tie-break, two modes joined back on the key. The reference's
    * nondeterministic F.first(AirlineName) is replaced by min() so results
    * are stable (determinism rule, SURVEY §7.4). */
  def q10ModeRank(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val priMode = modeByKey(o.toDF(), "o_custkey", "o_orderpriority")
      .withColumnRenamed("o_orderpriority", "mode_priority")
    val stMode = modeByKey(o.toDF(), "o_custkey", "o_orderstatus")
      .withColumnRenamed("o_orderstatus", "mode_status")
    priMode.join(stMode, Seq("o_custkey"))
      .orderBy(asc("o_custkey"))
  }

  /** A12+A13+J5+O5 aircraft-delay shape (aircrafts_lookup_to_kafka.py:24-59):
    * per-key rounded avg + count, dropDuplicates on the dim key before the
    * join, then min-max normalize to a 0..1 score. The reference collect()s
    * min/max; here a 1-row-agg broadcast crossJoin keeps it distributed.
    * Normalization runs over the ROUNDED avg so Spark and the oracle see
    * bit-identical inputs. */
  def q11DelayScore(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val sup = Tables(spark, dir, "supplier")
      .dropDuplicates("s_suppkey")
      .select("s_suppkey", "s_name")
    val stats = li.groupBy(col("l_suppkey"))
      .agg(
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("flight_count"))
      .filter(col("flight_count") > 10)
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"), "inner")
      .drop("s_suppkey")
    val bounds = stats.agg(
      min("avg_disc").as("_mn"), max("avg_disc").as("_mx"))
    stats.crossJoin(broadcast(bounds))
      .withColumn("delay_score01",
        round(minMaxScore(col("avg_disc"), col("_mn"), col("_mx"), scale = 1.0), 6))
      .select("l_suppkey", "s_name", "avg_disc", "flight_count", "delay_score01")
      .orderBy(desc("delay_score01"), asc("l_suppkey"))
  }

  /** J1+J2+P2+P4 dim-enrichment shape (shared.py:28-39): two-level broadcast
    * left join with rename/drop hygiene. */
  def q12EnrichJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation").select(col("n_nationkey"),
      col("n_regionkey"), col("n_name").as("nation_name"))
    val r = Tables(spark, dir, "region").select(col("r_regionkey"),
      col("r_name").as("region_name"))
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("nation_name"),
        col("region_name"), round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy(asc("c_custkey"))
  }

  /** §2.8 scalar-function surface: HHMM→"HH:mm" (flights_lookup_to_kafka
    * .py:15-16), callsign prefix rule (AirlineAircraftCountStream.java
    * extractAirlineCode), regexp_extract, trim/length/concat/upper. */
  def q13ScalarFuncs(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables(spark, dir, "supplier")
    sup.select(
        col("s_suppkey"),
        hhmmToStr(pmod(col("s_suppkey") * 137, lit(2400))).as("sched_time"),
        callsignAirline(concat(upper(substring(trim(col("s_name")), 1, 1)),
          col("s_suppkey").cast("string"))).as("airline_code"),
        regexp_extract(col("s_name"), "([0-9]+)", 1).cast("long").as("name_num"),
        length(trim(col("s_name"))).cast("long").as("name_len"))
      .orderBy(asc("s_suppkey"))
  }

  /** J8 geo theta join (AirportAircraftCountStream.java:58-88,201-237): every
    * event is matched against all airports within a haversine radius.
    * The reference (and the DuckDB oracle) is a nested-loop scan of the
    * airport store per event; here it runs as the scale-safe rewrite —
    * grid-cell equi-bucketing with neighbor explode + exact haversine
    * refine (core.geoGridJoin) — so the event side is probed on a 2-int
    * hash key instead of evaluating the distance against every airport.
    * Cell sizes satisfy the soundness bound for |lat| ≤ 60, radius 800 km:
    * 8° lat ≥ 7.2°, 15° lon ≥ 800/(111.195·cos60°) = 14.4°.
    * Coordinates are derived deterministically from integer keys (testdata
    * has no geo columns; FIXTURES.md). */
  def q14GeoJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .withColumn("ev_lat", (col("event_id") * 17 % 120 - 60).cast("double"))
      .withColumn("ev_lon", (col("event_id") * 29 % 360 - 180).cast("double"))
    val airports = Tables(spark, dir, "nation")
      .withColumn("ap_lat", (col("n_nationkey") * 7 % 120 - 60).cast("double"))
      .withColumn("ap_lon", (col("n_nationkey") * 13 % 360 - 180).cast("double"))
      .select("n_name", "ap_lat", "ap_lon")
    geoGridJoin(ev, airports,
      col("ev_lat"), col("ev_lon"), col("ap_lat"), col("ap_lon"),
      radiusKm = 800.0, cellLatDeg = 8.0, cellLonDeg = 15.0)
      .groupBy(col("n_name").as("airport"))
      .agg(
        count(lit(1)).as("match_count"),
        countDistinct(col("user_id")).as("distinct_aircraft"))
      .orderBy(asc("airport"))
  }

  /** O4 distinct projection (transform.py:58): enumerate years. */
  def q15DistinctYears(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    o.select(year(col("o_orderdate")).cast("long").as("order_year"))
      .distinct()
      .orderBy(asc("order_year"))
  }
}
