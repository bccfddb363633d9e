package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EmbedQueries
import graft.sources.Tables

/** q157 incremental kNN maintenance: the load-bearing property is fold ≡
  * rebuild (that equality is why q153's SQL serves as q157's oracle) —
  * pinned as frame equality under both the registered 10 %-delta
  * predicate and a single-vector delta; and the economics claim — the
  * touched set (the only standing vectors that re-rank) is
  * probe-ball-bounded, so a sparse delta re-ranks a small fraction, not
  * the corpus. */
class KnnIncrementalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("vec_id", "nbr_id", "rank", "cos_u")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._1, t._3)).toList

  test("fold equals rebuild under the registered 10% delta") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val isDelta = col("vec_id") % 10 === 7
    val fold = EmbedQueries.knnIncremental(
      EmbedQueries.knnGraph(emb.filter(!isDelta), 3), emb, isDelta, 3)
    val rebuild = EmbedQueries.knnGraph(emb, 3)
    assert(canon(fold) == canon(rebuild))
  }

  test("single-vector delta: fold equals rebuild, touched stays small") {
    val emb = Tables(spark, ClusteredEmbeddings.ensure(spark), "embeddings")
    val isDelta = col("vec_id") === 7
    val standing = EmbedQueries.knnGraph(emb.filter(!isDelta), 3)
    val fold = EmbedQueries.knnIncremental(standing, emb, isDelta, 3)
    val rebuild = EmbedQueries.knnGraph(emb, 3)
    assert(canon(fold) == canon(rebuild))
    // Economics: rows that changed relative to the standing graph are
    // the re-ranked set; one delta vector dirties at most its 9 probe
    // buckets, so the re-rank is a small fraction of 500 vectors.
    val standingRows = canon(standing).toSet
    val changedVecs = canon(fold).filterNot(standingRows)
      .map(_._1).distinct.length
    assert(changedVecs <= 100,
      s"$changedVecs vectors re-ranked for a single-vector delta — " +
        "the touched set is not probe-ball-bounded")
    assert(changedVecs >= 1, "the delta vector itself must gain edges")
  }
}
