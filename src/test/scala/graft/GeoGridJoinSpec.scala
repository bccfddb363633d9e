package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.core

/** geoGridJoin must return EXACTLY the pairs the naive cross-join-with-
  * haversine-predicate returns — bucketing is an optimization, never a
  * semantics change. */
class GeoGridJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select(col("id"), col("name")).as[(Long, String)].collect().toSet

  test("grid join equals brute force on a deterministic point cloud") {
    // Same derivation idiom as q14: lat in [-60, 59], lon in [-180, 179].
    val left = spark.range(500).toDF("id")
      .withColumn("lat", (col("id") * 17 % 120 - 60).cast("double"))
      .withColumn("lon", (col("id") * 29 % 360 - 180).cast("double"))
    val right = spark.range(40).toDF("rid")
      .withColumn("name", concat(lit("p"), col("rid")))
      .withColumn("rlat", (col("rid") * 7 % 120 - 60).cast("double"))
      .withColumn("rlon", (col("rid") * 13 % 360 - 180).cast("double"))
      .select("name", "rlat", "rlon")

    val brute = left.crossJoin(right)
      .filter(core.haversineKm(col("lat"), col("lon"), col("rlat"), col("rlon")) <= 800.0)
    val grid = core.geoGridJoin(left, right,
      col("lat"), col("lon"), col("rlat"), col("rlon"), 800.0, 8.0, 15.0)

    assert(pairsOf(grid) == pairsOf(brute))
    assert(pairsOf(grid).nonEmpty) // the test must actually exercise matches
  }

  test("antimeridian pairs are found (longitude cells wrap)") {
    val left = Seq((1L, 10.0, 179.5)).toDF("id", "lat", "lon")
    val right = Seq(("west", 10.0, -179.5)).toDF("name", "rlat", "rlon")
    val grid = core.geoGridJoin(left, right,
      col("lat"), col("lon"), col("rlat"), col("rlon"), 800.0, 8.0, 15.0)
    assert(pairsOf(grid) == Set((1L, "west")))
  }
}
