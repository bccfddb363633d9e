package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior pins for incremental cluster maintenance (q106) beyond the
  * shared-oracle hash (q106 reuses q101's full-closure oracle): direct
  * Spark-side equality with the batch recompute, the symmetric-probe
  * argument for the delta pair set, and the round-count advantage label
  * stars buy over deep historical components. */
class IncrementalClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val isDelta = col("vec_id") % 10 === 7

  test("incremental result equals the full recompute") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "cluster_id", "cluster_size", "is_canonical")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    val full = rows(graft.queries.EmbedQueries.q101SemdedupClusters(spark, sf))
    val incr = rows(graft.queries.EmbedQueries.q106IncrementalSemClusters(spark, sf))
    assert(incr == full,
      s"incremental diverged: extra=${incr -- full} missing=${full -- incr}")
    assert(full.nonEmpty)
  }

  test("delta pair set equals the full pair set restricted to delta-involving pairs") {
    import spark.implicits._
    val full = graft.queries.EmbedQueries
      .embedCosineNeardupPairs(spark, sf, 0.4)
      .select("vec_a", "vec_b")
      .as[(Long, Long)].collect().toSet
    val fullDelta = full.filter { case (a, b) => a % 10 == 7 || b % 10 == 7 }
    val delta = graft.queries.EmbedQueries
      .deltaCosinePairs(spark, sf, isDelta, 0.4)
      .select("vec_a", "vec_b")
      .as[(Long, Long)].collect().toSet
    assert(delta == fullDelta,
      s"probe symmetry broken: extra=${delta -- fullDelta} missing=${fullDelta -- delta}")
  }

  test("label stars converge faster than the deep chain they replace") {
    import spark.implicits._
    // A 64-node path graph: diameter 63, so full clustering needs several
    // halving rounds. Its label STARS are depth 1 — re-clustering the
    // stars plus one bridging delta edge must converge in fewer rounds.
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, fullRounds) =
      graft.queries.DocQueries.dedupClustersWithRounds(chain)
    val stars = labels
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("doc_a"), col("cluster_id").as("doc_b"))
    val delta = Seq((64L, 65L)).toDF("doc_a", "doc_b")
    val (relab, incrRounds) =
      graft.queries.DocQueries.dedupClustersWithRounds(stars.union(delta))
    assert(incrRounds < fullRounds,
      s"stars should beat the chain: incremental $incrRounds vs full $fullRounds")
    // And the merged component is intact: 65 nodes, one cluster, min label.
    val out = relab.select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect()
    assert(out.length == 65 && out.forall(r => r._2 == 1L && r._3 == 65L),
      s"merged component wrong: ${out.take(5).toSeq}…")
  }
}
