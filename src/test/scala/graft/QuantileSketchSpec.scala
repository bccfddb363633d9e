package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q164 bottom-k quantile sketch guarantees: the native aggregate must
  * equal the relational bottom-k exactly under every partitioning
  * (mergeability = set-union associativity on the pair set), a group
  * holding ≤ k distinct pairs is sampled COMPLETELY (so every rank-pick
  * is exact, not estimated), and the rank-pick estimator lands inside the
  * bottom-k order-statistics error band on a known distribution. */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sketch equals the relational bottom-k under every partitioning") {
    graft.functions.QuantileSketch.register(spark)
    val rows = (0L until 5000L).map(i =>
      ((i % 7).toString, (i * 2654435761L) % 100003L, i % 997L))
    val expected = rows.map(t => (t._1, (t._2, t._3))).distinct
      .groupBy(_._1).map { case (g, vs) =>
        g -> vs.map(_._2).distinct.sorted.take(64)
      }
    for (p <- Seq(1, 4, 32)) {
      val got = rows.toDF("g", "h", "v").repartition(p)
        .groupBy("g").agg(expr("graft_btk_pairs(h, v, 64)").as("pairs"))
        .collect().map { r =>
          r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
            .map(x => (x.getLong(0), x.getLong(1))).toList
        }.toMap
      expected.foreach { case (g, exp) =>
        assert(got(g) == exp, s"group $g diverged at repartition($p)")
      }
    }
  }

  test("a group under k distinct pairs is sampled completely and sorted") {
    graft.functions.QuantileSketch.register(spark)
    val got = Seq(("a", 9L, 90L), ("a", 3L, 30L), ("a", 9L, 90L),
      ("a", 7L, 70L))
      .toDF("g", "h", "v")
      .groupBy("g").agg(expr("graft_btk_pairs(h, v, 64)").as("pairs"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getLong(0), x.getLong(1))).toList
    assert(got == List((3L, 30L), (7L, 70L), (9L, 90L)))
  }

  test("q164: under-full groups are exact; full sketches land in the error band") {
    val out = graft.queries.DocQueries
      .q164QuantileSketch(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(7))) // source, n_docs, m, p50_est, p50_exact
    assert(out.nonEmpty)
    out.foreach { case (src, nDocs, m, p50Est, p50Exact) =>
      if (m >= nDocs)
        assert(p50Est == p50Exact,
          s"$src: sample covers the whole group — estimate must be exact")
      else {
        // A bottom-k sample's rank-q pick sits within O(1/sqrt(k)) of the
        // true quantile IN RANK; translate generously to value space via
        // the exact quartile spread (4 sigma-ish) — a failure means the
        // sampler broke, not bad luck (the hash is fixed, nothing is
        // random here).
        assert(p50Est > 0 && p50Exact > 0)
        val err = math.abs(p50Est - p50Exact).toDouble / p50Exact
        assert(err < 0.5,
          f"$src p50_est $p50Est vs exact $p50Exact (err $err%.3f)")
      }
    }
  }

  test("per-shard sketches re-aggregate to the direct global sketch (q167)") {
    graft.functions.QuantileSketch.register(spark)
    val rows = (0L until 4000L)
      .map(i => (i % 8, (i * 2654435761L) % 1000003L, i % 733L))
      .toDF("shard", "h", "v")
    val perShard = rows.groupBy("shard")
      .agg(expr("graft_btk_pairs(h, v, 64)").as("pairs"))
    val rolled = perShard.select(explode(col("pairs")).as("p"))
      .select(col("p.h").as("h"), col("p.v").as("v"))
      .agg(expr("graft_btk_pairs(h, v, 64)").as("pairs"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getLong(0), x.getLong(1))).toList
    val direct = rows.agg(expr("graft_btk_pairs(h, v, 64)").as("pairs"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getLong(0), x.getLong(1))).toList
    assert(rolled == direct,
      "rollup of stored per-shard sketches must equal the direct sketch")
  }

  test("rank-pick estimates on a known uniform distribution are tight") {
    graft.functions.QuantileSketch.register(spark)
    // values 1..10000 uniformly; true quartiles 2500/5000/7500. k=256 →
    // 1/sqrt(k) = 6.25% rank sigma; assert within 4 sigma = 25%.
    val rows = (1L to 10000L).map(i =>
      ("u", (i * 2654435761L) % 1000003L, i))
    val pairs = rows.toDF("g", "h", "v")
      .groupBy("g").agg(expr("graft_btk_pairs(h, v, 256)").as("pairs"))
      .select(expr("array_sort(transform(pairs, p -> p.v))").as("vs"))
      .collect()(0).getSeq[Long](0)
    val m = pairs.size
    assert(m == 256)
    for ((pct, truth) <- Seq(25 -> 2500L, 50 -> 5000L, 75 -> 7500L)) {
      val est = pairs((m * pct + 99) / 100 - 1)
      val err = math.abs(est - truth).toDouble / 10000.0
      assert(err < 0.25, f"p$pct est $est vs $truth (rank err $err%.3f)")
    }
  }
}
