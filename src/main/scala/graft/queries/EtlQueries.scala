package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.core.mortonInterleave16
import graft.sources.Tables

/** The ETL transform pipeline re-expressed Spark-first
  * (/root/reference/orchestration/src/transform.py:46-77).
  *
  * The reference loops over `collect()`ed years, filters per year, sorts
  * globally, and writes one file per year through `coalesce(1)` — a
  * single-writer bottleneck. Here the same result is ONE distributed write:
  * `partitionBy(year)` fans rows to per-year directories in parallel, and
  * `sortWithinPartitions` keeps the reference's date ordering per output
  * file without a global sort barrier. Down-stream reads get partition
  * pruning on year for free.
  *
  * Scratch output lives under the repo's target/ dir, keyed by scale
  * factor; the queries re-read what they wrote so the driver's oracle
  * checks the whole write→read→aggregate path.
  */
object EtlQueries {

  private def scratch(dir: String, name: String): String =
    s"${sys.props("user.dir")}/target/etl/${new java.io.File(dir).getName}/$name"

  /** S4+K1: year-partitioned parquet ETL write, then a pruning read-back
    * aggregate. Mirrors transform.py:60-70 minus the coalesce(1) and the
    * driver-side year loop. */
  def q30EtlYearPartition(spark: SparkSession, dir: String): DataFrame = {
    val out = scratch(dir, "orders_by_year")
    Tables(spark, dir, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
      .sortWithinPartitions("o_orderdate") // per-file date order, no global barrier
      .write.mode("overwrite").partitionBy("order_year").parquet(out)
    spark.read.parquet(out)
      .groupBy(col("order_year").cast("long").as("order_year"))
      .agg(
        count(lit(1)).as("order_count"),
        countDistinct(col("o_custkey")).as("distinct_customers"))
      .orderBy("order_year")
  }

  /** S1+S4: raw-CSV ingest path. Writes the orders table as per-year CSV
    * (the shape of the BTS Flights_<year>.csv drop zone), reads it back with
    * an explicit schema (no inference pass — SURVEY §1.4), tags each row
    * with the year parsed from its file path via input_file_name + regex
    * (transform.py:56), and aggregates by that derived file_year. Only
    * exactly-representable columns ride through CSV so the roundtrip is
    * bit-stable. */
  def q31CsvEtl(spark: SparkSession, dir: String): DataFrame = {
    val out = scratch(dir, "orders_csv")
    Tables(spark, dir, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "order_year")
      .write.mode("overwrite").option("header", "true").partitionBy("order_year").csv(out)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_orderpriority", StringType)))
    spark.read
      .option("header", "true")
      .option("recursiveFileLookup", "true") // plain file scan: no partition discovery,
      .option("pathGlobFilter", "*.csv")     // the year must come from the file name
      .schema(schema)
      .csv(out)
      .withColumn("file_year",
        regexp_extract(input_file_name(), "order_year=(\\d+)", 1).cast("long"))
      .groupBy("file_year")
      .agg(
        count(lit(1)).as("order_count"),
        countDistinct(col("o_custkey")).as("distinct_customers"))
      .orderBy("file_year")
  }

  /** S5-adjacent: JSON-LINES ingest — the reference's actual producer drop
    * format (producer/data/opensky_states.json; producer.py:59-75 emits
    * one JSON record per state vector). Writes the events table as JSON
    * lines with event time as epoch micros (JSON has no timestamp type —
    * the same convention as the KafkaWire payload), reads it back with an
    * EXPLICIT schema (inference would cost a second full scan, the same
    * rule as CSV — SURVEY §1.4), rebuilds the timestamp, and aggregates —
    * so the oracle checks the whole JSON write→read→aggregate round trip
    * at micro precision. */
  def q53JsonEtl(spark: SparkSession, dir: String): DataFrame = {
    val out = scratch(dir, "events_json")
    Tables(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"))
      .write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts_us", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType)))
    spark.read.schema(schema).json(out)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("event_count"),
        countDistinct(col("user_id")).as("distinct_users"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_seen"))
      .orderBy("event_type")
  }

  /** K1-adjacent: ORC round trip — the second columnar format Spark
    * supports natively (the ecosystem the reference sits in mixes
    * parquet- and ORC-resident warehouses; at 100 TB an engine that can
    * only scan one columnar format forces a rewrite of the other half).
    * Same contract as q53: write the lineitem slice as ORC, read it back,
    * aggregate — the oracle computes the identical aggregate from the
    * parquet source, so the check covers the whole ORC
    * write→read→aggregate path including type fidelity (decimal-free
    * slice: longs, strings and dates ride bit-stable through ORC). */
  def q56OrcEtl(spark: SparkSession, dir: String): DataFrame = {
    val out = scratch(dir, "lineitem_orc")
    Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"),
        col("l_returnflag"), col("l_shipdate"))
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("line_count"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        countDistinct(col("l_suppkey")).as("distinct_suppliers"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("last_ship"))
      .orderBy("l_returnflag")
  }

  /** Z-ORDER LAYOUT (q85): cluster the lineitem fact on the Morton
    * interleave of (l_partkey, l_suppkey) and audit the layout — per
    * Z-range bucket, the min/max SPAN of BOTH dimensions. This is the
    * write-side data-layout operator behind multi-dimensional file
    * skipping: rows land in files by `bucket`, each file's footer
    * min/max on partkey AND suppkey is ~1/8 of its domain (64 buckets =
    * an 8x8 grid), so a point/range predicate on EITHER column prunes
    * ~7/8 of the files from the listing alone — where a lexicographic
    * (partkey, suppkey) sort bounds only partkey and every file spans
    * the full suppkey domain (ZOrderSpec measures exactly this
    * contrast; the spans in this query's OUTPUT are that audit).
    *
    * Shape: dimension maxima are a 1-row broadcast; normalization,
    * spreading and interleaving are pure integer column ops (exactly
    * restated by the oracle in decimal-literal bit arithmetic); the
    * bucket is the top 6 Morton bits, so the whole key derivation is
    * MAP-ONLY and the single hash exchange is the 64-group audit
    * aggregate (PlanPinsSpec). At 100 TB the same key feeds
    * `repartitionByRange(morton)` + `sortWithinPartitions` on the write
    * path — the audit query stays this one, run over the file footers
    * instead of the rows. */
  def q85ZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val mx = li.agg(max(col("l_partkey")).as("max_pk"),
      max(col("l_suppkey")).as("max_sk"))
    li.select(col("l_partkey"), col("l_suppkey"))
      .crossJoin(broadcast(mx))
      .withColumn("pk16", expr("l_partkey * 65536 div (max_pk + 1)"))
      .withColumn("sk16", expr("l_suppkey * 65536 div (max_sk + 1)"))
      .withColumn("bucket",
        shiftright(mortonInterleave16(col("pk16"), col("sk16")), 26))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
        min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"))
      .withColumn("pk_span", col("pk_max") - col("pk_min"))
      .withColumn("sk_span", col("sk_max") - col("sk_min"))
      .orderBy(asc("bucket"))
  }
}
