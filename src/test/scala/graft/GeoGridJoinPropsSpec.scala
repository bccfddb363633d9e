package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.ops.core

/** Property: for ANY point cloud within the documented soundness band,
  * geoGridJoin returns exactly the brute-force pair set. Randomized
  * complement to GeoGridJoinSpec's deterministic cloud. */
object GeoGridJoinPropsSpec extends Properties("graft.ops.core.geoGridJoin") {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Spark round-trips per case are expensive; a few diverse clouds suffice.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private val pointGen = for {
    lat <- Gen.choose(-60.0, 60.0) // within the 15°-lon-cell soundness band
    lon <- Gen.choose(-180.0, 180.0)
  } yield (lat, lon)

  property("grid join == brute force for random clouds (radius 800km)") =
    forAll(
      Gen.listOfN(60, pointGen), Gen.listOfN(12, pointGen)) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((la, lo), i) => (i.toLong, la, lo) }
        .toDF("id", "lat", "lon")
      val right = rs.zipWithIndex.map { case ((la, lo), i) => (s"p$i", la, lo) }
        .toDF("name", "rlat", "rlon")
      val brute = left.crossJoin(right)
        .filter(core.haversineKm(col("lat"), col("lon"), col("rlat"), col("rlon")) <= 800.0)
        .select("id", "name").as[(Long, String)].collect().toSet
      val grid = core.geoGridJoin(left, right,
        col("lat"), col("lon"), col("rlat"), col("rlon"), 800.0, 8.0, 15.0)
        .select("id", "name").as[(Long, String)].collect().toSet
      Prop(grid == brute)
    }
}
