package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.core
import graft.plans.GeoGridJoinRule

/** The optimizer-level geo-join rewrite (graft.plans.GeoGridJoinRule): a
  * user writes the naive crossJoin + haversine radius filter; the rule must
  * (a) turn it into a cell equi-join — no nested-loop over pairs — and
  * (b) change nothing about the result, including polar and antimeridian
  * edge cases, because the original predicate is kept as the refine.
  */
class GeoGridRuleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Child session with the rule active (runtime scoping — the cluster
    * path is spark.sql.extensions=graft.functions.GraftExtensions). */
  private def ruleSession(): SparkSession = {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(GeoGridJoinRule)
    s
  }

  private def points(s: SparkSession, n: Int, seed: Long): DataFrame = {
    import s.implicits._
    // deterministic pseudo-random points biased to cover poles and the
    // antimeridian: lat in [-90, 90], lon in [-180, 180)
    (0 until n).map { k =>
      val h = k * 2654435761L + seed
      val lat = ((h % 1800001L + 1800001L) % 1800001L) / 10000.0 - 90.0
      val lon = (((h / 7) % 3600000L + 3600000L) % 3600000L) / 10000.0 - 180.0
      (k.toLong, lat, lon)
    }.toDF("id", "lat", "lon")
  }

  private def naive(l: DataFrame, r: DataFrame, radiusKm: Double): DataFrame =
    l.crossJoin(r.select(col("id").as("rid"), col("lat").as("rlat"), col("lon").as("rlon")))
      .filter(core.haversineKm(col("lat"), col("lon"), col("rlat"), col("rlon")) <= radiusKm)
      .select(col("id"), col("rid"))

  test("naive haversine join is rewritten to a cell equi-join, same result") {
    val s = ruleSession()
    val l = points(s, 400, seed = 11L)
    val r = points(s, 60, seed = 77L)
    val df = naive(l, r, 800.0)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("_g_cell_lat"), s"rule did not fire:\n$opt")
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"),
      s"still a nested-loop plan:\n$phys")

    // ground truth: identical query, rule NOT registered
    val truth = naive(points(spark, 400, seed = 11L), points(spark, 60, seed = 77L), 800.0)
    assert(!truth.queryExecution.optimizedPlan.toString.contains("_g_cell_lat"))
    val a = df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val b = truth.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(a == b, s"rewrite changed results: only-rewritten=${a diff b} only-naive=${b diff a}")
    assert(a.nonEmpty, "degenerate test: no pairs matched")
  }

  test("polar and antimeridian pairs survive the rewrite (edge sweep)") {
    val s = ruleSession()
    import s.implicits._
    val edge = Seq(
      (1L, 89.9, 10.0), (2L, 89.5, -170.0), (3L, 88.0, 100.0), // polar cluster
      (4L, 60.0, 179.9), (5L, 60.0, -179.9),                    // antimeridian
      (6L, -89.8, 0.0), (7L, -89.0, 179.0),                     // south polar
      (8L, 79.9, 20.0), (9L, 80.1, 21.0),                       // straddle the cut
      (10L, 0.0, 0.0), (11L, 0.5, 0.5))
    val df = edge.toDF("id", "lat", "lon")
    val got = naive(df, df, 500.0)
    assert(got.queryExecution.optimizedPlan.toString.contains("_g_cell_lat"))
    val gotSet = got.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // ground truth from the unrewritten plan on the same data
    val truthDf = spark.createDataFrame(edge).toDF("id", "lat", "lon")
    val truth = naive(truthDf, truthDf, 500.0)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(gotSet == truth, s"diff: ${gotSet diff truth} / ${truth diff gotSet}")
    // the pairs that naive cell grids lose MUST be present: across the
    // antimeridian, across the polar cut, and pole-adjacent at wide Δlon
    Seq(4L -> 5L, 8L -> 9L, 1L -> 2L, 6L -> 7L, 2L -> 3L).foreach { p =>
      assert(gotSet.contains(p), s"edge pair $p missing")
    }
  }

  test("randomized parity vs unrewritten, multiple radii") {
    val s = ruleSession()
    // includes the historical miss bands: radii just under a LonDivisors
    // value (asin(x) > x opened a sliver above the linearized bound, e.g.
    // ~555-580 km at the 30° divisor) and 1000-1100 km where pairs
    // straddling the 80° polar cut used to fall 2 lon cells apart.
    for ((radius, seed) <- Seq((150.0, 3L), (800.0, 5L), (950.0, 9L),
        (555.0, 13L), (575.0, 17L), (580.0, 19L), (1000.0, 23L),
        (1050.0, 29L), (1100.0, 31L))) {
      val a = naive(points(s, 250, seed), points(s, 40, seed + 1), radius)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val b = naive(points(spark, 250, seed), points(spark, 40, seed + 1), radius)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(a == b, s"radius=$radius mismatch: ${a diff b} / ${b diff a}")
    }
  }

  test("polar-cut straddle at wide Δlon is not dropped (regression)") {
    // Left row just below the cut keeps a normal lon cell; right row above
    // it compresses longitude (√(cos 80°·cos 85°) < cos 80°), so their lon
    // cells can be 2 apart — only the widened catch-all margin catches the
    // pair. haversine((80,-0.5),(85,60.3)) ≈ 969 km <= 1000.
    val s = ruleSession()
    import s.implicits._
    val l = Seq((1L, 80.0, -0.5)).toDF("id", "lat", "lon")
    val r = Seq((2L, 85.0, 60.3)).toDF("id", "lat", "lon")
    val df = naive(l, r, 1000.0)
    assert(df.queryExecution.optimizedPlan.toString.contains("_g_cell_lat"),
      "rule did not fire at radius 1000")
    assert(df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet ==
      Set(1L -> 2L), "straddle pair dropped by the rewrite")
  }

  test("registered q44 runs through the rewrite (plan pinned)") {
    val df = graft.queries.ParityPlusQueries
      .q44GeoAutoRewrite(spark, "/root/testdata/sf0.001")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("_g_cell_lat"), s"q44 lost the rewrite:\n$opt")
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"))
    assert(df.collect().nonEmpty)
  }

  test("oversized radii and non-geo joins are left alone") {
    val s = ruleSession()
    import s.implicits._
    val l = points(s, 20, 1L)
    val r = points(s, 20, 2L)
    // radius beyond the polar-margin bound: rule must decline
    val big = naive(l, r, 2000.0)
    assert(!big.queryExecution.optimizedPlan.toString.contains("_g_cell_lat"))
    // plain equi-join: untouched
    val eq = l.join(r.select(col("id").as("rid")), col("id") === col("rid"))
    assert(!eq.queryExecution.optimizedPlan.toString.contains("_g_cell_lat"))
    // manual geoGridJoin output: not re-bucketed (marker guard)
    val manual = core.geoGridJoin(
      l, r.select(col("id").as("rid"), col("lat").as("rlat"), col("lon").as("rlon")),
      col("lat"), col("lon"), col("rlat"), col("rlon"),
      radiusKm = 500.0, cellLatDeg = 8.0, cellLonDeg = 15.0)
    assert(!manual.queryExecution.optimizedPlan.toString.contains("_g_cell_lat"))
  }
}
