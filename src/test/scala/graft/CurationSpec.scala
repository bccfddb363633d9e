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
}
