package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.core

/** End-to-end check of the cluster deployment path
  * (`spark.sql.extensions=graft.functions.GraftExtensions`): a session
  * BUILT with the extensions must expose the custom functions with no
  * runtime registration call and run the geo-join auto-rewrite from the
  * injected optimizer rule — the exact wiring a cluster admin configures
  * once. Uses a second SparkSession over the shared SparkContext. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions session: functions + geo rule active by construction") {
    SparkTestSession.spark // ensure the shared context exists
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions())
        .getOrCreate()
      // functions resolve with zero runtime registration
      val d = s.sql(
        """SELECT graft_dot(array(cast(1.0 as float), cast(2.0 as float)),
          |                 array(cast(3.0 as float), cast(4.0 as float))) AS d""".stripMargin)
        .collect().head.getDouble(0)
      assert(d == 11.0)
      val b = s.sql(
        "SELECT graft_lsh_bucket(array_repeat(cast(1.0 as float), 64), 8) AS b")
        .collect().head.getLong(0)
      assert(b >= 0 && b < 256)
      // the round-18 quartet completion resolves through the extension too
      val q = s.sql(
        """SELECT graft_btk_pairs(h, v, 2) AS p FROM
          |  (SELECT cast(id * 7 % 5 AS bigint) AS h, cast(id AS bigint) AS v
          |   FROM range(5))""".stripMargin)
        .collect().head.getSeq[org.apache.spark.sql.Row](0)
        .map(x => (x.getLong(0), x.getLong(1))).toList
      assert(q == List((0L, 0L), (1L, 3L)))

      // the injected optimizer rule rewrites a naive haversine join
      def pts(ss: SparkSession, n: Int) = ss.range(n).select(
        col("id"),
        (col("id") * 37 % 120 - 60).cast("double").as("lat"),
        (col("id") * 53 % 360 - 180).cast("double").as("lon"))
      def naive(ss: SparkSession) =
        pts(ss, 50).crossJoin(
          pts(ss, 20).select(col("id").as("rid"), col("lat").as("rlat"), col("lon").as("rlon")))
          .filter(core.haversineKm(col("lat"), col("lon"), col("rlat"), col("rlon")) <= 800.0)
          .select("id", "rid")
      val df = naive(s)
      assert(df.queryExecution.optimizedPlan.toString.contains("_g_cell_lat"),
        "injected rule did not fire")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = naive(SparkTestSession.spark)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == truth && got.nonEmpty)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
