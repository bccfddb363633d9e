package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":"total","value":N,"unit":"sec",...}.
  *
  * Each query is forced through a `noop`-format write — a materializing
  * action that evaluates the full plan (projections, final sort) without
  * letting Catalyst prune work the way `.count()` would, and without the
  * driver-side cost of `collect()`.
  *
  * A separate untimed warmup pass first materializes the shared input
  * persists (graft.sources.Tables hot set) and JIT-warms the session, so the
  * per-query timings measure query cost, not first-touch scan cost. The
  * warmup wall time is reported in its own field for transparency.
  *
  * A failing query is NOT swallowed: its error lands in an "errors" JSON
  * field, its time is recorded as -1, and the process exits non-zero.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Untimed warmup: touch every hot input through the Tables cache.
    val w0 = System.nanoTime()
    graft.sources.Tables.all.foreach { t =>
      try materialize(graft.sources.Tables(spark, sfDir, t))
      catch { case _: Throwable => () } // a missing optional table is fine
    }
    val warmupSec = (System.nanoTime() - w0) / 1e9

    // min-of-N per query: a single pass conflates query cost with JIT/GC/
    // machine noise (round-2's streaming numbers were ~4x inflated by
    // exactly that); min over repeats is the standard steady-state estimate.
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt.max(1)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        try {
          materialize(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            errors.getOrElseUpdate(name,
              e.toString.replaceAll("[\"\\\\\n\r\t]", " ").take(200))
            -1.0
        }
      }
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"\"$k\":\"$v\"" }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"repeats":$repeats,"warmup_sec":$warmupSec,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
