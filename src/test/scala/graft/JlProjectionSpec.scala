package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EmbedQueries
import graft.sources.Tables

/** q148 JL sign projection: retention is MEASURED on both data regimes
  * (the AnnRecallSpec convention) — the clustered fixture keeps most of
  * its exact top-10 through the 4× dimension cut (intra-cluster cosine
  * ≈ 0.96 survives any distance-preserving projection), while the
  * near-uniform corpus keeps almost nothing (its cosine ordering is
  * noise-level — there is no structure for JL to preserve, and a high
  * pin here would be a lie). Output structure and partition invariance
  * are pinned on both. */
class JlProjectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("clustered corpus: projection preserves CLUSTERS, and retention " +
      "reflects the two scales honestly") {
    val emb = Tables(spark, ClusteredEmbeddings.ensure(spark), "embeddings")
    val rows = EmbedQueries.jlRetention(emb).collect()
    // What JL at 16 dims genuinely preserves is the inter-cluster gap
    // (cosine 0.96 vs ~0 dwarfs the projection distortion): every
    // projected top-10 neighbor must come from the query's own cluster.
    val impure = rows.count(r => r.getLong(1) % 16 != r.getLong(0) % 16)
    assert(impure == 0, s"$impure cross-cluster neighbors in projected top-10")
    // What it does NOT preserve is the ORDER within a ~31-member
    // cluster (intra-cluster cosine spreads are below the distortion),
    // so exact-top-10 retention sits near the 10/31 within-cluster
    // shuffle floor — pinned from both sides so a silent change in
    // either direction (projection broken, or someone "fixing" the pin
    // upward) gets caught.
    val retained = rows.map(_.getLong(4)).sum
    assert(retained >= 10L && retained <= 35L,
      s"clustered retention $retained/50 outside the two-scale band")
  }

  test("near-uniform corpus: retention is honestly near zero") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val retained = EmbedQueries.jlRetention(emb)
      .agg(sum("in_exact")).collect()(0).getLong(0)
    // noise-level cosine ordering does not survive 64 -> 16 dims; this
    // pin DOCUMENTS the regime rather than hiding it
    assert(retained <= 10L, s"uniform retention $retained/50 — " +
      "suspiciously high for a structureless corpus")
  }

  test("output shape: dense ranks 1..10 per query, binary in_exact") {
    val emb = Tables(spark, ClusteredEmbeddings.ensure(spark), "embeddings")
    val rows = EmbedQueries.jlRetention(emb).collect()
    assert(rows.length == 50)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    for ((q, rs) <- byQ)
      assert(rs.map(_.getLong(2)).sorted.toList == (1L to 10L).toList,
        s"query $q ranks not dense")
    assert(rows.forall(r => Set(0L, 1L)(r.getLong(4))))
  }

  test("projection + ranking bit-identical under every partitioning") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val ref = EmbedQueries.jlRetention(emb).collect().map(_.toSeq).toList
    for (p <- Seq(1, 3, 16)) {
      val got = EmbedQueries.jlRetention(emb.repartition(p))
        .collect().map(_.toSeq).toList
      assert(got == ref, s"diverged at repartition($p)")
    }
  }
}
