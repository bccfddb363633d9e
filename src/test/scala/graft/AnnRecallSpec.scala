package graft

import org.scalatest.funsuite.AnyFunSuite

/** Honest recall accounting for the two ANN scale paths: approximate
  * search trades recall for bounded candidate sets, and that trade should
  * be MEASURED, not implied. Ground truth is q27's brute-force top-k
  * restricted to k=3; recall@3 = |approx ∩ truth| / |truth| over the five
  * query vectors. The pins are deterministic (seeded quantizer, no RNG) —
  * if a refactor silently degrades a path (bucket math drift, probe bug),
  * the pinned floor fails before any oracle does, because the oracles
  * assert the approximate result AS SPECIFIED, not its quality. */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.filter(org.apache.spark.sql.functions.col("rank") <= 3)
      .select("q_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }

  private def recall(approx: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]): Double = {
    val hits = truth.map { case (q, t) =>
      (approx.getOrElse(q, Set.empty) intersect t).size.toDouble / t.size }
    hits.sum / truth.size
  }

  test("LSH and IVF recall@3 vs brute force stays above the documented floor") {
    val truth = topk(graft.queries.EmbedQueries.q27EmbedCosineTopk(spark, sf))
    assert(truth.size == 5)
    val lsh = recall(topk(graft.queries.EmbedQueries.q28EmbedAnnLsh(spark, sf)), truth)
    val ivf = recall(topk(graft.queries.EmbedQueries.q46EmbedIvfAnn(spark, sf)), truth)
    info(f"recall@3: lsh=$lsh%.3f ivf=$ivf%.3f")
    // deterministic pins (sf0.01, no RNG anywhere): measured lsh=0.40
    // (Hamming<=2 probing, ~20% candidate fraction — near-uniform synthetic
    // vectors give sign-LSH little angular structure to exploit; clustered
    // real embeddings do far better at the same probe budget) and
    // ivf=0.933 (nProbe=2 of 16 lists). Fail = a path silently degraded.
    assert(lsh >= 0.35, f"LSH recall collapsed: $lsh%.3f")
    assert(ivf >= 0.90, f"IVF recall collapsed: $ivf%.3f")
    // both paths must actually return candidates for every query
    assert(topk(graft.queries.EmbedQueries.q46EmbedIvfAnn(spark, sf)).size == 5)
  }

  /** Exact L2 top-3 per query (vec_id < 5) — q98's ground truth: PQ-ADC
    * approximates SQUARED-L2, so q27's cosine truth is the wrong
    * yardstick on unnormalized vectors. */
  private def l2Truth(dir: String): Map[Long, Set[Long]] = {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val d2 = aggregate(
      zip_with(col("embedding"), col("qv"), (a, b) => {
        val d = a.cast("double") - b.cast("double"); d * d
      }), lit(0.0), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("d2"), col("vec_id"))
    topk(emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), d2.as("d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3))
  }

  test("PQ-ADC recall@3 vs exact L2 stays above the documented floors") {
    val truth = l2Truth(sf)
    assert(truth.size == 5)
    val pq = recall(topk(
      graft.queries.EmbedQueries.q98EmbedPqAdc(spark, sf)), truth)
    // 16-bit codes (4 subspaces × 16 seed centroids) summarizing 64
    // near-uniform float dims, then the exact rerank of the ADC-top-32
    // shortlist — measured 0.53 (the same worst-case regime that pins
    // LSH at 0.40; ADC alone measured 0.20 before the ladder landed).
    info(f"PQ-ADC recall@3 vs exact L2 (near-uniform): $pq%.3f")
    assert(pq >= 0.45, f"PQ-ADC recall collapsed: $pq%.3f")
    // Clustered fixture (the regime real embeddings live in), identical
    // code and code budget — the compression has structure to exploit.
    val dir = ClusteredEmbeddings.ensure(spark)
    val pqC = recall(topk(
      graft.queries.EmbedQueries.q98EmbedPqAdc(spark, dir)), l2Truth(dir))
    // Measured 1.00: the cluster IS one quantization cell, the ADC
    // shortlist admits the whole cell, the rerank orders it exactly —
    // ADC without the rerank measured 0.07 here (within-cell blindness).
    info(f"PQ-ADC recall@3 vs exact L2 (clustered): $pqC%.3f")
    assert(pqC >= 0.95, f"clustered PQ-ADC recall collapsed: $pqC%.3f")
  }

  test("IVF-PQ recall@3 vs exact L2: the probe cost composes with the PQ cost") {
    val ivfpq = recall(topk(
      graft.queries.EmbedQueries.q99EmbedIvfPq(spark, sf)), l2Truth(sf))
    info(f"IVF-PQ recall@3 vs exact L2 (near-uniform): $ivfpq%.3f")
    // Measured 0.87 — ABOVE plain PQ's 0.53, which surprised us: the
    // probe does drop true neighbors assigned to unprobed lists, but it
    // also evicts ADC-noise candidates from the FIXED 32-slot shortlist
    // (over the full corpus the shortlist is the binding constraint, and
    // contention loses more truth than the probe does). The two cuts
    // compose favorably, not multiplicatively.
    assert(ivfpq >= 0.75, f"IVF-PQ recall collapsed: $ivfpq%.3f")
    val dir = ClusteredEmbeddings.ensure(spark)
    val ivfpqC = recall(topk(
      graft.queries.EmbedQueries.q99EmbedIvfPq(spark, dir)), l2Truth(dir))
    // Clustered: the probed lists coincide with the query's cluster, so
    // the probe loses nothing and the ladder holds its 1.00.
    info(f"IVF-PQ recall@3 vs exact L2 (clustered): $ivfpqC%.3f")
    assert(ivfpqC >= 0.95, f"clustered IVF-PQ recall collapsed: $ivfpqC%.3f")
  }

  test("clustered embeddings: the same probe budgets buy far higher recall") {
    // The near-uniform pins above are the honest WORST case; this is the
    // measured counterpart on data with angular structure (deterministic
    // 16-cluster mixture, intra-cluster cosine ~0.96 — ClusteredEmbeddings).
    // Identical query code, identical probe budgets — only the data changes.
    val dir = ClusteredEmbeddings.ensure(spark)
    val truth = topk(graft.queries.EmbedQueries.q27EmbedCosineTopk(spark, dir))
    assert(truth.size == 5)
    val lsh = recall(topk(graft.queries.EmbedQueries.q28EmbedAnnLsh(spark, dir)), truth)
    val ivf = recall(topk(graft.queries.EmbedQueries.q46EmbedIvfAnn(spark, dir)), truth)
    info(f"clustered recall@3: lsh=$lsh%.3f ivf=$ivf%.3f (near-uniform: 0.40 / 0.93)")
    assert(lsh >= 0.85, f"clustered LSH recall collapsed: $lsh%.3f")
    assert(ivf >= 0.95, f"clustered IVF recall collapsed: $ivf%.3f")
  }

  test("binary-code recall@3 vs brute force stays above the documented floors") {
    // q111's 1-bit ladder: recall here IS shortlist recall (the rerank
    // above the cut is exact cosine), so the pin measures how well
    // 64 sign bits rank true neighbors into the top-50 of 500.
    val truth = topk(graft.queries.EmbedQueries.q27EmbedCosineTopk(spark, sf))
    val bin = recall(topk(graft.queries.EmbedQueries.q111EmbedBinaryTopk(spark, sf)), truth)
    val dir = ClusteredEmbeddings.ensure(spark)
    val truthC = topk(graft.queries.EmbedQueries.q27EmbedCosineTopk(spark, dir))
    val binC = recall(topk(graft.queries.EmbedQueries.q111EmbedBinaryTopk(spark, dir)), truthC)
    info(f"binary recall@3: near-uniform=$bin%.3f clustered=$binC%.3f")
    // deterministic pins: measured 0.867 near-uniform (top-50 of 500 by
    // 64-bit Hamming — sign codes preserve most angular order even
    // without structure) and 1.000 clustered.
    assert(bin >= 0.80, f"binary recall collapsed (near-uniform): $bin%.3f")
    assert(binC >= 0.95, f"binary recall collapsed (clustered): $binC%.3f")
  }

  test("q113 semantic decontamination: flags only true train×eval near-dups; recall measured") {
    import org.apache.spark.sql.functions._
    graft.functions.VectorExpressions.register(spark)
    val emb = graft.sources.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"),
        sqrt(call_function("graft_dot", col("embedding"), col("embedding"))).as("nrm"))
    // Exhaustive train×eval ground truth at the same threshold.
    val train = emb.filter(col("vec_id") % 10 =!= 7)
    val eval_ = emb.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id").as("e_id"), col("embedding").as("ee"), col("nrm").as("enrm"))
    val truth = train.crossJoin(eval_)
      .select(col("vec_id"),
        round(call_function("graft_dot", col("embedding"), col("ee")) /
          (col("nrm") * col("enrm")), 6).as("cosine"))
      .filter(col("cosine") >= 0.4)
      .select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val got = graft.queries.EmbedQueries.q113SemanticDecontaminate(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.subsetOf(truth), s"flagged a non-contaminated vector: ${got -- truth}")
    val recall = if (truth.isEmpty) 1.0 else (got intersect truth).size.toDouble / truth.size
    info(f"q113 contamination recall=$recall%.3f (${got.size}/${truth.size})")
    assert(truth.nonEmpty, "fixture has no contamination — test vacuous")
    // deterministic pin: measured 0.444 (4/9) on the near-uniform fixture
    // — the same sign-LSH regime as q36's 0.576 pair recall (little
    // angular structure to exploit; clustered real embeddings do far
    // better at the same probe budget, per the q36/q28 clustered pins).
    assert(recall >= 0.40, f"probed-LSH contamination recall collapsed: $recall%.3f")
  }

  test("q114 hard negatives: every mined negative has a different label, ranked by cosine") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.EmbedQueries.q114HardNegatives(spark, sf)
    assert(out.filter(col("n_label") === col("q_label")).count() == 0,
      "a same-label vector leaked into the negatives")
    val perQ = out.groupBy("q_id").count().collect().map(_.getLong(1)).toSet
    assert(perQ == Set(5L), s"expected 5 negatives per query, got $perQ")
    // rank order must follow cosine descending within each query
    val bad = out.selectExpr("q_id", "rank", "cosine",
      "lag(cosine) over (partition by q_id order by rank) as prev")
      .filter(col("prev").isNotNull && col("prev") < col("cosine")).count()
    assert(bad == 0, "rank order does not follow cosine")
  }

  private def pairRecall(dir: String): (Double, Int, Int) = {
    import org.apache.spark.sql.functions._
    graft.functions.VectorExpressions.register(spark)
    val emb = graft.sources.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        sqrt(call_function("graft_dot", col("embedding"), col("embedding"))).as("nrm"))
    val truth = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        round(call_function("graft_dot", col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")), 6).as("cosine"))
      .filter(col("cosine") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graft.queries.EmbedQueries.q36EmbedCosineNeardup(spark, dir)
      .select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(truth), "bucketed path produced a non-pair (refine broken)")
    ((got intersect truth).size.toDouble / truth.size, got.size, truth.size)
  }

  test("near-dup pair recall vs brute force stays above the documented floor") {
    val (recall, got, truth) = pairRecall(sf)
    info(f"near-dup pair recall=$recall%.3f ($got/$truth pairs)")
    // measured 0.58 with Hamming<=1 probing at sf0.01 (single-bucket was
    // 0.12); real cosine>=0.9 near-dups sit near 0.9 at this probe cost
    assert(recall >= 0.5, f"near-dup recall collapsed: $recall%.3f")
  }

  test("near-dup pair recall on clustered embeddings at the same probe cost") {
    // The claim behind q36's "real near-dups do far better": same query,
    // same Hamming<=1 probe budget, clustered data (intra-cluster cosine
    // ~0.96 — the actual near-dup regime) instead of near-uniform.
    val (recall, got, truth) = pairRecall(ClusteredEmbeddings.ensure(spark))
    info(f"clustered near-dup pair recall=$recall%.3f ($got/$truth pairs; near-uniform: 0.58)")
    assert(truth > 1000, "clustered fixture should be dense in true pairs")
    assert(recall >= 0.85, f"clustered near-dup recall collapsed: $recall%.3f")
  }

  test("q131: the registered harness agrees with this spec's independent recall computation") {
    import org.apache.spark.sql.functions.col
    val out = graft.queries.EmbedQueries.q131AnnRecallEval(spark, sf).collect()
    assert(out.length == 5, s"one row per query vector, got ${out.length}")
    out.foreach { r =>
      val (nHits, recallPpm, t1, rr) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nHits >= 0 && nHits <= 10 && recallPpm == nHits * 100000L,
        s"recall arithmetic drifted: $r")
      if (t1 == 0L) assert(rr == 0L, s"missed top-1 must have rr 0: $r")
      else assert(t1 >= 1 && t1 <= 10 && rr == 1000000L / t1,
        s"rr arithmetic drifted: $r")
    }
    // Cross-check the exact arm against q27 (brute-force top-10) and the
    // approximate arm against q28's candidate discipline: when q28's
    // top-3 contains the true NN, the harness's top1_rank must be <= 3.
    val q27Top1 = graft.queries.EmbedQueries.q27EmbedCosineTopk(spark, sf)
      .filter(col("rank") === 1).select("q_id", "vec_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q28Sets = topk(graft.queries.EmbedQueries.q28EmbedAnnLsh(spark, sf))
    out.foreach { r =>
      val q = r.getLong(0)
      if (q28Sets.getOrElse(q, Set.empty).contains(q27Top1(q)))
        assert(r.getLong(3) >= 1 && r.getLong(3) <= 3,
          s"q28 found the true NN in its top-3 but the harness ranked it at ${r.getLong(3)}: $r")
    }
  }
}
