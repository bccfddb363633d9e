package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel
import scala.collection.concurrent.TrieMap

/** Central source layer for the engine.
  *
  * The reference reads CSV with `inferSchema=True` (an extra full scan of the
  * file — /root/reference/orchestration/src/transform.py:52) and parquet globs
  * (batch_process.py:243). Here every read goes through one place so that:
  *   - schemas are explicit where the format needs it (CSV),
  *   - the big fact tables are persisted once per (session, dir) when many
  *     queries share a scan (the reference re-scans parquet for each of its
  *     9 queries — batch_process.py:243-253),
  *   - at cluster scale the cache is a no-op knob (`spark.graft.cacheInputs=
  *     false`) and plans fall back to pure parquet scans with pushdown.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables worth persisting across the multi-query batch runs. Dimensions
    * are small enough that a broadcast re-read is cheap. */
  private val hot = Set("lineitem", "orders", "events", "documents", "embeddings")

  /** Hot tables whose cached relation is additionally spread across the
    * session's parallelism. Only tables whose consumers are FLOAT-ORDER
    * INSENSITIVE qualify: repartitioning reorders rows, and a double
    * sum/avg aggregated in a different order can flip a 4-decimal
    * rounding against the (sequential) DuckDB oracle. The embedding
    * family hashes, counts and compares per row; the doc family's one
    * cross-row float mean (q21's ratio averages) quantizes each ratio to
    * an integer BEFORE summation precisely so this repartition stays
    * safe (DocQueries.q21DocsTextStats) — while lineitem/orders/events
    * feed genuine avg/sum-of-double aggregates and stay in file order.
    *
    * The value is the ROWS-PER-PARTITION divisor for the size-scaled
    * repartition (see [[apply]]); ~1000 rows/task amortizes scheduling
    * for the per-row work these families do. A consumer whose per-row
    * cost is amplified far beyond that (q36's pair-verify join evaluates
    * hundreds of dot products per embedding row) fans out its OWN input
    * instead (EmbedQueries.q36EmbedCosineNeardup) — tuning the shared
    * cache for the heaviest consumer is what regressed the
    * overhead-bound probe queries in round 5. */
  private val spread = Map("documents" -> 1000L, "embeddings" -> 1000L)

  private val cache = TrieMap.empty[(String, String, String), DataFrame]

  /** Load `<dir>/<name>.parquet`, persisted if hot and caching enabled.
    *
    * [[spread]] tables are REPARTITIONED at build time: the testdata
    * tables are single parquet files with one row group, which Spark
    * cannot split — so without this, every narrow pass downstream (the
    * doc family's tokenize/annotate stages) runs as ONE task no matter
    * how many cores the session has (measured: q47's annotation pass went
    * superlinear on the ×30 amplified corpus purely from this). The
    * partition count SCALES WITH THE TABLE — one partition per ~1000 rows,
    * capped at the session parallelism — because the fix must not
    * overshoot the other way: unconditionally fanning a 2000-row table
    * out to 32 partitions made every downstream stage scheduler-overhead-
    * dominated at sf0.1 (the round-5 q20/q46 slowdowns: 32 tasks × ~60
    * rows per stage; measured +0.3–0.5 s each, recovered by this rule).
    * At 100 TB the same files carry thousands of row groups and split
    * naturally — which is why the `cacheInputs=false` cluster path stays
    * a pure pushdown-friendly scan with no forced exchange. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val cachingOn =
      !spark.conf.getOption("spark.graft.cacheInputs").contains("false")
    if (cachingOn && hot(name)) {
      cache.getOrElseUpdate((spark.sparkContext.applicationId, dir, name), {
        val df = read(spark, dir, name)
        val laidOut = spread.get(name) match {
          case Some(rowsPerPartition) =>
            // Floor at 2, never 1: repartition(1) reports SinglePartition
            // once materialized, which satisfies EVERY clustered
            // distribution and lets EnsureRequirements elide the very
            // exchanges the plan audits (PlanPinsSpec) pin — a tiny-SF
            // cache would then make downstream plans shape-dependent on
            // WHICH suite materialized it first. Two ~250-row partitions
            // cost nothing; the 100 TB path never takes this branch.
            val target = math.min(
              spark.sparkContext.defaultParallelism.toLong,
              math.max(2L, df.count() / rowsPerPartition)).toInt
            df.repartition(target)
          case None => df
        }
        laidOut.persist(StorageLevel.MEMORY_AND_DISK)
      })
    } else read(spark, dir, name)
  }

  /** Release every persisted input cached for this (session, dir) — the
    * Tables-level twin of `DocQueries.unpersistShared`. A multi-corpus run
    * (the scale rehearsal's ×3/×10/×30 loop) otherwise holds EVERY earlier
    * factor's fact tables at MEMORY_AND_DISK for the whole run; harmless
    * at one corpus, pure spill pressure across several. */
  def release(spark: SparkSession, dir: String): Unit = {
    val appId = spark.sparkContext.applicationId
    cache.keys.filter(k => k._1 == appId && k._2 == dir).foreach { k =>
      cache.remove(k).foreach(_.unpersist(blocking = false))
    }
  }

  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The testdata writer emits TIMESTAMP(NANOS) parquet, which Spark 4
    // rejects unless the session was built with
    // spark.sql.legacy.parquet.nanosAsLong=true (a session-build setting —
    // deliberately NOT set here: a read path must not mutate shared session
    // config). With the flag on, nanos arrive as long and the timestamp is
    // rebuilt at micro precision (integer `div` — a double division loses
    // precision on ~1.7e18 nano epochs).
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val tsFixed = df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case None    => df
    }
    // The testdata writer has also shipped timestamps as parquet
    // TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 surfaces as
    // TIMESTAMP_NTZ — a type `unix_micros`/`to_utc_timestamp` and friends
    // reject. Every graft session runs with session.timeZone=UTC, so the
    // NTZ→TIMESTAMP cast below is value-preserving (same micros, same wall
    // clock) and restores the single timestamp type the whole query surface
    // is written against.
    val ntz = tsFixed.schema.fields.filter(_.dataType == TimestampNTZType)
    if (ntz.isEmpty) tsFixed
    else ntz.foldLeft(tsFixed) { (d, f) =>
      d.withColumn(f.name, col(f.name).cast(TimestampType))
    }
  }

  /** CSV reader with an explicit schema — no inference pass. Mirrors the
    * reference ingest (transform.py:51-52) minus the double scan. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** CSV reader that trims header whitespace like transform.py:53-54
    * (`toDF(*[c.strip() for c in df.columns])`). Inference kept as an
    * explicit opt-in fallback. */
  def csvInferTrimmed(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(path)
    df.toDF(df.columns.toIndexedSeq.map(_.trim): _*)
  }
}
