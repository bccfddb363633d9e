package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries

/** Behavior tests for the near-dup detector: planted duplicates must be
  * found, unrelated docs must not pair up. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from a warm windowsill nearby"

  test("minhash finds a planted near-duplicate and skips unrelated docs") {
    val docs = Seq(
      (1L, base),
      (2L, base + " tonight"), // near-dup: one appended word
      (3L, "completely different words about spark shuffles joins aggregates and columnar parquet scans only"),
      (4L, "tiny doc") // < 3 tokens → no shingles → must not crash or pair
    ).toDF("doc_id", "text")
    val pairs = DocQueries.minhashNeardup(docs, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("identical texts get jaccard 1.0") {
    val docs = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val j = DocQueries.minhashNeardup(docs, 0.9)
      .select("jaccard").as[Double].collect()
    assert(j.toSeq == Seq(1.0))
  }

  test("q47 annotates AFTER the anti-join, from the tokenized cache (plan pin)") {
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = DocQueries.q47CorpusManifest(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan
    val anti = plan.collectFirst {
      case j @ Join(_, _, LeftAnti, _, _) => j
    }.getOrElse(fail(s"no LeftAnti join in q47 plan:\n$plan"))
    // the heavy per-doc annotation (the rolling-hash fingerprint) must NOT
    // be computed below the anti-join — losers leave first
    assert(!anti.left.toString.contains("aggregate("),
      s"fingerprint computed before the anti-join:\n${anti.left}")
    assert(plan.toString.contains("aggregate("),
      "fingerprint annotation missing entirely")
    // and the survivors read the shared tokenized InMemoryRelation
    assert(anti.left.toString.contains("InMemoryRelation"),
      s"anti-join left side does not read the tokenized cache:\n${anti.left}")
  }
}
