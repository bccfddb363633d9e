package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural guarantees of the curation operators (q49–q51) that the
  * value-level oracle can't see: determinism under re-execution, budget
  * maximality, and containment. These are the properties a 100 TB run
  * leans on — a retry that re-draws the sample or a pack that under-fills
  * its budget corrupts a corpus silently while still "looking right". */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("stratified sample is deterministic and tracks its per-stratum rates") {
    val a = graft.queries.DocQueries.q49StratifiedSample(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    val b = graft.queries.DocQueries.q49StratifiedSample(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b, "re-execution must reproduce the identical sample")

    val docs = graft.sources.Tables(spark, sf, "documents")
    val byLang = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = graft.queries.DocQueries.q49StratifiedSample(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, total) =>
      val rate = if (lang == "en") 0.25 else 0.75
      val got = sampled.getOrElse(lang, 0L).toDouble / total
      // md5 buckets are uniform; at n>=64 per stratum a +-0.20 absolute
      // band is ~4 sigma — failure means the hash or rate logic broke,
      // not bad luck.
      assert(math.abs(got - rate) < 0.20,
        f"$lang sampled at $got%.2f, want ~$rate%.2f of $total")
    }
  }

  test("token-budget pack equals an independent greedy fill per stratum") {
    import spark.implicits._
    val budget = 2000L
    val packed = graft.queries.DocQueries.q50TokenBudgetPack(spark, sf)
      .select("lang", "doc_id", "n_tokens", "cum_tokens")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(packed.nonEmpty)
    packed.groupBy(_._1).foreach { case (lang, rows) =>
      val total = rows.map(_._3).sum
      assert(total <= budget, s"$lang over budget: $total")
      assert(rows.map(_._4).max == total,
        s"$lang cumulative bookkeeping diverged from the token sum")
    }
    // Independent re-implementation: a driver-side greedy fill in quality
    // order (same 6-rounded score, same tie-break) must select exactly the
    // same documents as the window-based pack — this is what pins the
    // window frame (ROWS, not RANGE) and the prefix semantics.
    val tk = split(lower(trim(col("text"))), "\\s+")
    val n = size(tk).cast("long")
    val stop = size(filter(tk, x => x === "the" || x === "a")).cast("double") / size(tk)
    val ttr = size(array_distinct(tk)).cast("double") / size(tk)
    val quality = round(lit(0.4) * ttr + lit(0.3) * (lit(1.0) - stop) +
      lit(0.3) * least(n.cast("double") / 100.0, lit(1.0)), 6)
    val universe = graft.sources.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), n.as("n_tokens"), quality.as("quality"))
      .as[(Long, String, Long, Double)].collect().toSeq
    universe.groupBy(_._2).foreach { case (lang, docs) =>
      val ordered = docs.sortBy(d => (-d._4, d._1))
      val cums = ordered.scanLeft(0L)(_ + _._3).tail
      val expect = ordered.zip(cums).takeWhile(_._2 <= budget).map(_._1._1).toSet
      val got = packed.filter(_._1 == lang).map(_._2).toSet
      assert(got == expect, s"$lang pack diverged from the greedy fill")
    }
  }

  test("packing's histogram prefilter is exact on adversarial strata") {
    import spark.implicits._
    // The prefilter prunes docs whose quality bucket has >= budget tokens
    // strictly above it. These fixtures aim at its edges: a stratum where
    // EVERY doc shares one bucket (nothing prunable), one where the single
    // best doc overflows the budget alone (everything prunable after it),
    // one where the budget covers the whole stratum, and one whose
    // boundary bucket carries ties that must survive the prune.
    val rows = Seq(
      // one-bucket degenerate: identical quality, tie-break by doc_id
      (1L, "flat", 400L, 0.5), (2L, "flat", 400L, 0.5),
      (3L, "flat", 400L, 0.5), (4L, "flat", 400L, 0.5),
      // first doc alone exceeds the budget
      (10L, "big", 5000L, 0.9), (11L, "big", 10L, 0.8),
      // budget covers everything
      (20L, "tiny", 5L, 0.3), (21L, "tiny", 6L, 0.2),
      // boundary bucket ties: 0.7004/0.7001 share bucket 700 with
      // different admission outcomes; 0.699 sits one bucket below
      (30L, "edge", 600L, 0.7004), (31L, "edge", 600L, 0.7001),
      (32L, "edge", 600L, 0.699), (33L, "edge", 600L, 0.1),
      // null stratum: the cutoff equi-join can't name it — it must fall
      // through to the exact window un-pruned, not be dropped
      (40L, null.asInstanceOf[String], 300L, 0.6),
      (41L, null.asInstanceOf[String], 800L, 0.4))
    val scored = rows.toDF("doc_id", "lang", "n_tokens", "quality")
    val budget = 1000L
    val got = graft.queries.DocQueries.packToBudget(scored, budget)
      .select("lang", "doc_id", "cum_tokens")
      .as[(String, Long, Long)].collect().toSeq
      .sortBy(r => (Option(r._1).getOrElse(""), r._3))
    // Independent naive fill per stratum (no prefilter)
    val expect = rows.groupBy(_._2).toSeq.flatMap { case (lang, docs) =>
      val ordered = docs.sortBy(d => (-d._4, d._1))
      val cums = ordered.scanLeft(0L)(_ + _._3).tail
      ordered.zip(cums).takeWhile(_._2 <= budget)
        .map { case (d, c) => (lang, d._1, c) }
    }.sortBy(r => (Option(r._1).getOrElse(""), r._3))
    assert(got == expect,
      s"prefilter diverged from the naive window:\n got=$got\n exp=$expect")
    // spot-check the edges explicitly: flat keeps docs 1-2 (800 <= 1000 <
    // 1200); big keeps nothing; tiny keeps both; edge keeps 30 (600) but
    // not 31 (1200 > budget)
    assert(got.filter(_._1 == "flat").map(_._2) == Seq(1L, 2L))
    assert(!got.exists(_._1 == "big"))
    assert(got.filter(_._1 == "tiny").map(_._2).toSet == Set(20L, 21L))
    assert(got.filter(_._1 == "edge").map(_._2) == Seq(30L))
    assert(got.filter(_._1 == null).map(_._2) == Seq(40L),
      "null stratum must survive the prefilter and pack normally")
  }

  test("packing passes null-quality rows through the prefilter") {
    import spark.implicits._
    // `null >= min_qb` is null, which filter() treats as false — without
    // the explicit isNull arm a null-quality row in a stratum that HAS a
    // cutoff would silently vanish before the window ever saw it. It must
    // instead reach the window and take its null ordering (last, for the
    // desc(quality) sort).
    val rows = Seq[(Long, String, Long, java.lang.Double)](
      (50L, "nq", 100L, 0.9), (51L, "nq", 200L, null),
      (52L, "nq", 300L, 0.8))
    val got = graft.queries.DocQueries
      .packToBudget(rows.toDF("doc_id", "lang", "n_tokens", "quality"), 1000L)
      .orderBy("cum_tokens")
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toSeq
    assert(got == Seq((50L, 100L), (52L, 400L), (51L, 600L)),
      s"null-quality row must survive the prefilter and sort last: $got")
  }

  test("source cap evicts the dominant source and backfills from the next") {
    import spark.implicits._
    // One language, two sources. src_big's docs outscore src_small's, so
    // an uncapped 300-token pack would be all src_big; a 150-token
    // per-source cap must stop src_big at 150 and backfill src_small.
    val rows = Seq(
      (60L, "xx", "src_big", 100L, 0.9),
      (61L, "xx", "src_big", 50L, 0.8),
      (62L, "xx", "src_big", 100L, 0.7), // cap-evicted (would hit 250)
      (63L, "xx", "src_small", 100L, 0.5),
      (64L, "xx", "src_small", 50L, 0.4))
      .toDF("doc_id", "lang", "source", "n_tokens", "quality")
    val capped = graft.queries.DocQueries
      .packToBudget(rows, 150L, Seq("lang", "source"))
      .withColumnRenamed("cum_tokens", "cum_src_tokens")
    val packed = graft.queries.DocQueries.packToBudget(capped, 300L)
      .orderBy("cum_tokens")
      .select("doc_id", "cum_src_tokens", "cum_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    assert(packed == Seq((60L, 100L, 100L), (61L, 150L, 150L),
      (63L, 100L, 250L), (64L, 150L, 300L)),
      s"cap-then-fill must evict doc 62 and admit both src_small docs: $packed")
  }

  test("decontamination flags only held-out docs, with genuine overlap") {
    import spark.implicits._
    val flagged = graft.queries.DocQueries.q51Decontaminate(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(flagged.nonEmpty)
    assert(flagged.values.forall(_ >= 10))
    val heldOut = graft.sources.Tables(spark, sf, "documents")
      .filter(col("source") === "src19")
      .select("doc_id").as[Long].collect().toSet
    assert(flagged.keySet.subsetOf(heldOut),
      "contamination flags must only ever name held-out documents")
  }

  // q76's oracle restates percentile_approx as the exact element at rank
  // ceil(p*n). That is an implementation property of Spark's GK sketch at
  // full accuracy (n << accuracy), not an API promise — so pin it HERE: a
  // Spark upgrade that changes tie handling or rank rounding fails this
  // unit test instead of the cross-engine hash run.
  test("percentile_approx at full accuracy returns the element at rank ceil(p*n), partition-stable") {
    import spark.implicits._
    // Distinct values so the expected rank is unambiguous; n far below
    // the 1e6 accuracy so the sketch holds every element exactly.
    val n = 1237
    val values = scala.util.Random.shuffle((1 to n).map(_ * 3.0).toVector)
    val sorted = values.sorted
    for (parts <- Seq(1, 7, 32)) {
      val df = spark.createDataset(values).repartition(parts).toDF("v")
      val ps = (1 to 9).map(p => lit(p / 10.0))
      val got = df.agg(percentile_approx(col("v"), array(ps: _*), lit(1000000)))
        .head.getSeq[Double](0)
      val want = (1 to 9).map(p => sorted(math.ceil(p / 10.0 * n).toInt - 1))
      assert(got == want,
        s"parts=$parts: percentile_approx drifted from the rank-ceil(p*n) " +
          s"element q76's oracle hardcodes — got $got, want $want")
    }
  }

  test("q123: split assignment is a pure function of doc_id — corpus growth never moves a doc") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = graft.sources.Tables(spark, sf, "documents")
    val full = graft.queries.DocQueries.splitAssign(docs, 90, 95)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // The SAME docs assigned on a 20%-subset "earlier corpus": every
    // shared id must carry the identical split.
    val sub = graft.queries.DocQueries
      .splitAssign(docs.filter(col("doc_id") % 5 === 0), 90, 95)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    sub.foreach { case (id, s) =>
      assert(full(id) == s, s"doc $id moved from ${full(id)} to $s as the corpus grew")
    }
    // Totality + disjointness: one split per doc, every doc covered.
    assert(full.size == docs.count())
    assert(full.values.toSet.subsetOf(Set("train", "val", "test")))
    // Realized fractions concentrate at 90/5/5 (md5 buckets are uniform;
    // a ±6-point absolute band at n=500 is >4 sigma for the 5% splits).
    val n = full.size.toDouble
    val frac = full.values.groupBy(identity).map { case (k, v) => k -> v.size / n }
    assert(math.abs(frac.getOrElse("train", 0.0) - 0.90) < 0.06, s"train: $frac")
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.05) < 0.06, s"val: $frac")
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.05) < 0.06, s"test: $frac")
    // Independence from q49/q116's draws over the same ids: the salt
    // means the split is NOT the stratified-sample hash — at least one
    // doc differs in bucket parity from the unsalted hash stream.
    val unsalted = docs.select(col("doc_id"),
      (org.apache.spark.sql.functions.conv(
        org.apache.spark.sql.functions.substring(
          org.apache.spark.sql.functions.md5(col("doc_id").cast("string")), 1, 8),
        16, 10).cast("long") % lit(100L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = graft.queries.DocQueries.splitAssign(docs, 90, 95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unsalted.exists { case (id, b) => salted(id) != b },
      "salted split buckets must differ from the unsalted id-hash stream")
  }

  test("q132: cluster-balanced sample is quota-exact, rank-contiguous, and duplicate-free") {
    val rows = graft.queries.EmbedQueries.q132ClusterSample(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val docs = rows.map(_._2)
    assert(docs.distinct.length == docs.length, "a doc landed in two clusters")
    rows.groupBy(_._1).foreach { case (cid, xs) =>
      val ranks = xs.map(_._3).sorted.toSeq
      assert(ranks == (1L to ranks.length).toSeq,
        s"cluster $cid ranks not contiguous from 1: $ranks")
      assert(ranks.length <= 8, s"cluster $cid over quota: ${ranks.length}")
    }
    // Balance is the point: no cluster may dominate the sample the way a
    // global top-128 would (the fixture's global cut covers few clusters).
    assert(rows.map(_._1).distinct.length >= 8,
      "sample collapsed onto too few clusters to call balanced")
  }
}
