package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The lookup-snapshot publish job re-expressed Spark-first
  * (/root/reference/orchestration/src/flights_lookup_to_kafka.py).
  *
  * The reference `collect()`s the joined snapshot to the driver and loops a
  * confluent Producer over rows (:57-93) — a driver bottleneck that dies at
  * scale. The Spark-native sink shape is an executor-side projection to
  * (key, value=to_json(struct(...))): exactly what `df.write.format("kafka")`
  * consumes, verifiable here as a plain result set (driver contract sinks
  * to parquet; the projection IS the operator).
  */
object SinkQueries {

  /** J3 + K3: inner-join the airline dim, derive the callsign key from
    * joined columns (ICAO ‖ flight number — flights_lookup_to_kafka.py:
    * 25-28), aggregate twice per derived key, join the aggregates ON that
    * derived key (J4 shape), and project the executor-side Kafka record:
    * key = callsign, value = to_json(struct(...)). */
  def q19CallsignJoinSink(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") % 1000 < 50) // P5 early filter (py:23)
    val sup = Tables(spark, dir, "supplier")
    val enriched = li
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey")) // J3 inner
      .select(
        concat(
          upper(substring(trim(col("s_name")), 1, 1)),
          (col("s_suppkey") % 100).cast("string"), lit("-"),
          (col("l_orderkey") % 100).cast("string")).as("callsign"),
        col("l_quantity"))
      .filter(length(col("callsign")) >= 3) // length guard (py:23,28)
    val arr = enriched.groupBy("callsign").agg(count(lit(1)).as("flight_count"))
    val dep = enriched.groupBy("callsign")
      .agg(round(avg("l_quantity"), 2).cast("string").as("avg_qty"))
    arr.join(dep, Seq("callsign")) // join ON the derived key
      .select(
        col("callsign").as("key"),
        to_json(struct(col("callsign"), col("flight_count"), col("avg_qty")))
          .as("value"))
      .orderBy("key")
  }
}
