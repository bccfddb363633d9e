package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries

/** q170 Poisson bootstrap: the properties that make the independent-
  * Poisson resample a valid bootstrap — per-replicate total weight
  * concentrates at n (sum of n Poisson(1) draws), the percentile CI
  * brackets the point estimate, the CI width obeys the 1/√n law, and
  * the whole table is a deterministic function of the data (any
  * partitioning, same hashes, same CI — which is why a DuckDB oracle
  * can check a bootstrap at all). */
class BootstrapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def synth(n: Int, src: String = "s0"): DataFrame =
    (0 until n).map(i => (src, i.toLong, (i % 613 + 20).toLong))
      .toDF("source", "doc_id", "n_chars")

  private def rows(df: DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toList

  test("deterministic under every partitioning") {
    val base = rows(DocQueries.bootstrapCi(synth(3000), 100))
    for (p <- Seq(1, 7, 32)) {
      assert(rows(DocQueries.bootstrapCi(synth(3000).repartition(p), 100))
        == base, s"CI table diverged at repartition($p)")
    }
  }

  test("per-replicate Poisson weight concentrates at n") {
    import org.apache.spark.sql.functions._
    val n = 4000
    val docs = synth(n)
    val u = expr("CAST(conv(substring(md5(concat('boot:', CAST(b AS STRING), ':', CAST(doc_id AS STRING))), 1, 14), 16, 10) AS BIGINT)")
    val weights = docs
      .select(col("doc_id"), explode(sequence(lit(0), lit(199))).as("b"))
      .withColumn("u", u)
      .withColumn("cnt",
        when(col("u") < 26508507426831584L, 0L)
          .when(col("u") < 53017014853663168L, 1L)
          .when(col("u") < 66271268567078960L, 2L)
          .when(col("u") < 70689353138217560L, 3L)
          .when(col("u") < 71793874281002208L, 4L)
          .when(col("u") < 72014778509559136L, 5L)
          .when(col("u") < 72051595880985288L, 6L)
          .when(col("u") < 72056855505474736L, 7L)
          .otherwise(8L))
      .groupBy("b").agg(sum("cnt").as("w"))
      .collect().map(_.getLong(1))
    assert(weights.length == 200)
    // sum of n Poisson(1): mean n, sd sqrt(n); 5 sigma band — a breach
    // means the ladder or hash broke, not bad luck (nothing is random)
    val band = 5 * math.sqrt(n)
    weights.foreach(w => assert(math.abs(w - n) < band,
      s"replicate weight $w outside $n ± $band"))
  }

  test("the CI brackets the point estimate on the real corpus") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001",
      "documents").select("source", "doc_id", "n_chars")
    val out = rows(DocQueries.bootstrapCi(docs, 200))
    assert(out.nonEmpty)
    out.foreach { case (src, point, lo, hi, nb) =>
      assert(nb == 200L, s"$src lost replicates")
      assert(lo <= point && point <= hi,
        s"$src: point $point outside CI [$lo, $hi]")
      assert(lo < hi, s"$src: degenerate CI")
    }
  }

  test("CI width obeys the 1/sqrt(n) law") {
    def width(n: Int): Double = {
      val r = rows(DocQueries.bootstrapCi(synth(n), 200)).head
      (r._4 - r._3).toDouble
    }
    val w1 = width(1000)
    val w4 = width(4000)
    // quadrupling n should roughly halve the width; allow generous slack
    assert(w4 < 0.7 * w1,
      f"width $w4%.0f at 4n vs $w1%.0f at n — no 1/sqrt(n) shrinkage")
    assert(w4 > 0.3 * w1, "width collapsed faster than the law allows")
  }

  // ---- q174 delta CIs ----

  private def synthAt(n: Int, src: String, idBase: Long,
                      shift: Long): DataFrame =
    (0 until n).map(i => (src, idBase + i, (i % 613 + 20 + shift)))
      .toDF("source", "doc_id", "n_chars")

  private def deltaRows(df: DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toList

  test("delta CI: identical arms insignificant, planted separation significant") {
    // s0/s1 draw from the SAME length distribution (different ids, so
    // the Poisson draws differ); s2 is +200 chars per doc — a real
    // separation the CI must call.
    val docs = synthAt(3000, "s0", 0L, 0L)
      .unionByName(synthAt(3000, "s1", 100000L, 0L))
      .unionByName(synthAt(3000, "s2", 200000L, 200L))
    val out = deltaRows(DocQueries.bootstrapDeltaCi(docs, 200))
    assert(out.map(t => (t._1, t._2)) ==
      List(("s0", "s1"), ("s0", "s2"), ("s1", "s2")))
    out.foreach { case (sa, sb, pd, lo, hi, nb, sig) =>
      assert(nb == 200L, s"($sa,$sb) lost replicates")
      assert(lo <= pd && pd <= hi, s"($sa,$sb): point $pd outside [$lo,$hi]")
      assert(sig == (if (lo > 0 || hi < 0) 1L else 0L),
        s"($sa,$sb): verdict column disagrees with its own interval")
    }
    val m = out.map(t => ((t._1, t._2), t)).toMap
    assert(m(("s0", "s1"))._7 == 0L, "identical arms called significant")
    assert(m(("s0", "s2"))._7 == 1L && m(("s0", "s2"))._3 < 0L,
      "planted +200 separation missed (s2 is the longer arm)")
    assert(m(("s1", "s2"))._7 == 1L)
  }

  test("delta CI width obeys the 1/sqrt(n) law") {
    def width(n: Int): Double = {
      val docs = synthAt(n, "s0", 0L, 0L)
        .unionByName(synthAt(n, "s1", 1000000L, 0L))
      val r = deltaRows(DocQueries.bootstrapDeltaCi(docs, 200)).head
      (r._5 - r._4).toDouble
    }
    val w1 = width(1000)
    val w4 = width(4000)
    assert(w4 < 0.7 * w1,
      f"delta width $w4%.0f at 4n vs $w1%.0f at n — no 1/sqrt(n) shrinkage")
    assert(w4 > 0.3 * w1, "delta width collapsed faster than the law allows")
  }

  test("delta CI is deterministic under every partitioning") {
    val docs = synthAt(1500, "s0", 0L, 0L)
      .unionByName(synthAt(1500, "s1", 500000L, 35L))
    val base = deltaRows(DocQueries.bootstrapDeltaCi(docs, 100))
    for (p <- Seq(1, 7, 32)) {
      assert(deltaRows(DocQueries.bootstrapDeltaCi(docs.repartition(p), 100))
        == base, s"delta CI table diverged at repartition($p)")
    }
  }
}
