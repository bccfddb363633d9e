package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries

/** Behavior pins for the q95 bigram LM score: the probability boundary,
  * the fluency ordering, and the partition-exactness claim the integer
  * arithmetic exists to guarantee. */
class LmScoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def scores(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] =
    DocQueries.bigramLmScore(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, s) => id -> (n, s) }.toMap

  test("deterministic-successor corpus scores exactly 1e6 ppm everywhere") {
    // Every prefix has ONE successor corpus-wide → p(w2|w1) = 1 for every
    // bigram → integer mean is exactly 1,000,000 with no rounding loss.
    val out = scores(Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "a b c")))
    assert(out.values.forall(_._2 == 1000000L), s"expected all 1e6: $out")
    assert(out(1L)._1 == 3 && out(3L)._1 == 2)
  }

  test("a doc of corpus-typical bigrams outscores a doc with a surprising one") {
    val filler = (1 to 8).map(_ => "x y").mkString(" ")
    val out = scores(Seq(
      (1L, filler), (2L, filler), (3L, "x z")))
    assert(out(1L)._2 > out(3L)._2,
      s"the x→z doc must score below the x→y docs: $out")
  }

  test("scores are identical under any input partitioning") {
    // The reason p is quantized ppm BEFORE the mean: partial-aggregate
    // merges combine exact longs, so parallelism cannot move a score.
    val docs = (0L until 60L).map(i =>
      (i, s"w${i % 7} w${(i + 1) % 5} w${(i + 2) % 3} w${i % 2}"))
    val base = scores(docs)
    for (p <- Seq(1, 3, 13)) {
      val repart = DocQueries.bigramLmScore(
        docs.toDF("doc_id", "text").repartition(p))
        .as[(Long, Long, Long)].collect()
        .map { case (id, n, s) => id -> (n, s) }.toMap
      assert(repart == base, s"score moved under repartition($p)")
    }
  }

  // ---- q118 trigram stupid-backoff ----

  import org.apache.spark.sql.functions.{col, split, lower, trim}

  private def triScores(docs: Seq[(Long, String, String)]) =
    DocQueries.trigramBackoffScore(
      docs.toDF("doc_id", "lang", "text")
        .select(col("doc_id"), col("lang"),
          split(lower(trim(col("text"))), "\\s+").as("toks")),
      col("lang") === "en")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("q118 tiers fire exactly where evidence stops, with the exact integer scores") {
    // Train: one en doc "a b c a b c" — trigrams {abc:2(via a b c a? no:
    // positions: (a,b,c),(b,c,a),(c,a,b),(a,b,c)}; bigrams ab:2, bc:2,
    // ca:1, cb:0...; unigrams a:2,b:2,c:2, N=6.
    val out = triScores(Seq(
      (1L, "en", "a b c a b c"),
      (2L, "fr", "a b c"),   // trigram in model → tier 3: c123=2, c12=2 → 1e6
      (3L, "fr", "x b c"),   // (x,b,c) unseen; bigram bc seen → tier 2: 4e5*2/2 = 4e5
      (4L, "fr", "x y c"),   // trigram+bigram(yc) unseen; c unigram: 1.6e5*2/6 = 53333
      (5L, "fr", "x y z"))) // all unseen, z OOV → 0
    assert(out(2L) == ((1L, 1L, 0L, 0L, 1000000L)), s"tier-3 doc: ${out(2L)}")
    assert(out(3L) == ((1L, 0L, 1L, 0L, 400000L)), s"tier-2 doc: ${out(3L)}")
    assert(out(4L) == ((1L, 0L, 0L, 1L, 53333L)), s"tier-1 doc: ${out(4L)}")
    assert(out(5L) == ((1L, 0L, 0L, 1L, 0L)), s"OOV doc: ${out(5L)}")
  }

  test("q120 selection is a maximal top-100 by importance and internally consistent") {
    val sel = graft.queries.DocQueries
      .q120ImportanceSelect(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(sel.length == 100)
    sel.foreach { case (_, _, t, r, imp) =>
      assert(imp == t - r, "importance must be exactly target - raw")
    }
    // Maximality against the independently recomputed full table.
    val tok = graft.sources.Tables(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"), col("lang"),
        split(lower(trim(col("text"))), "\\s+").as("toks"))
    val full = DocQueries.trigramBackoffScore(tok, col("lang") === "en")
      .select(col("doc_id"), col("score_ppm").as("t"))
      .join(DocQueries.trigramBackoffScore(tok, org.apache.spark.sql.functions.lit(true))
        .select(col("doc_id"), col("score_ppm").as("r")), "doc_id")
      .select(col("doc_id"), (col("t") - col("r")).as("imp"))
      .collect().map(x => x.getLong(0) -> x.getLong(1))
    val selIds = sel.map(_._2).toSet
    val minSel = full.filter(p => selIds(p._1)).map(_._2).min
    val maxExcl = full.filterNot(p => selIds(p._1)).map(_._2).max
    assert(minSel >= maxExcl, s"non-maximal selection: $minSel < $maxExcl")
  }

  test("q118 self-scored train docs never back off") {
    val out = DocQueries.q118TrigramLmScore(spark, "/root/testdata/sf0.01")
    val en = graft.sources.Tables(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "lang")
    val broken = out.join(en, "doc_id")
      .filter(col("lang") === "en" &&
        (col("n_hit2") > 0 || col("n_hit1") > 0)).count()
    assert(broken == 0, "an en doc backed off under the en-trained model")
    // The fixture must exercise every tier, or the oracle certifies
    // nothing about backoff.
    val agg = out.selectExpr("sum(n_hit3)", "sum(n_hit2)", "sum(n_hit1)")
      .collect()(0)
    assert(agg.getLong(0) > 0 && agg.getLong(1) > 0 && agg.getLong(2) > 0,
      s"all three tiers must fire on the fixture: $agg")
  }
}
