package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q121 KMV sketch guarantees: the native aggregate must equal the
  * relational k-min exactly under every partitioning (mergeability is
  * not a vibe — it is set-union associativity, testable), sources under
  * k distinct hashes report exactly, and the estimator lands inside the
  * theoretical error band on the fixture. */
class KmvSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sketch equals the relational k-min under every partitioning") {
    graft.functions.KmvSketch.register(spark)
    val rows = (0L until 5000L).map(i => ((i % 7).toString, (i * 2654435761L) % 100003L))
    val expected = rows.distinct.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.sorted.take(64)
    }
    for (p <- Seq(1, 4, 32)) {
      val got = rows.toDF("g", "h").repartition(p)
        .groupBy("g").agg(expr("graft_kmv_mins(h, 64)").as("mins"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
      expected.foreach { case (g, exp) =>
        assert(got(g) == exp, s"group $g diverged at repartition($p)")
      }
    }
  }

  test("a group under k distinct values reports them all, sorted") {
    graft.functions.KmvSketch.register(spark)
    val got = Seq(("a", 9L), ("a", 3L), ("a", 9L), ("a", 7L))
      .toDF("g", "h")
      .groupBy("g").agg(expr("graft_kmv_mins(h, 64)").as("mins"))
      .collect()(0).getSeq[Long](1).toList
    assert(got == List(3L, 7L, 9L))
  }

  test("q121 estimator lands inside the KMV error band on the fixture") {
    val out = graft.queries.DocQueries
      .q121KmvDistinct(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    out.foreach { case (src, kHeld, est, exact) =>
      if (kHeld < 256)
        assert(est == exact, s"$src under-full sketch must be exact")
      else {
        // 1/sqrt(k) ~ 6.25% is one sigma; 4 sigma = 25% — a failure here
        // means the estimator or hash broke, not bad luck.
        val err = math.abs(est - exact).toDouble / exact
        assert(err < 0.25, f"$src est $est vs exact $exact (err $err%.3f)")
      }
    }
  }
}
