package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural guarantees of the temperature mix (q102) beyond the DuckDB
  * value oracle: brute-force equality of the whole α=1/2 pipeline, the
  * up-sampling property that is the operator's reason to exist, and the
  * integer-exactness of the allocation arithmetic. */
class TemperatureMixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  /** The q22 scoring surface rebuilt from the raw table — an independent
    * restatement the brute force below consumes. */
  private def scored() = {
    val t = split(lower(trim(col("text"))), "\\s+")
    graft.sources.Tables(spark, sf, "documents").select(
      col("doc_id"), col("source"),
      size(t).cast("long").as("n_tokens"),
      round(lit(0.4) * (size(array_distinct(t)).cast("double") / size(t)) +
        lit(0.3) * (lit(1.0) -
          size(filter(t, x => x === "the" || x === "a")).cast("double") / size(t)) +
        lit(0.3) * least(size(t).cast("double") / 100.0, lit(1.0)), 6)
        .as("quality"))
  }

  test("q102 equals a driver-side brute-force temperature pack") {
    import spark.implicits._
    val rows = scored().as[(Long, String, Long, Double)].collect().toSeq
    val budget = 6000L
    // α = 1/2 allocation, all-integer: w = floor(sqrt(mass)), a = B*w div S.
    val mass = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val w = mass.view.mapValues(m => math.sqrt(m.toDouble).toLong).toMap
    val sw = w.values.sum
    val alloc = w.view.mapValues(wi => budget * wi / sw).toMap
    val expect = rows.groupBy(_._2).flatMap { case (src, docs) =>
      var cum = 0L
      docs.sortBy(d => (-d._4, d._1)).flatMap { d =>
        cum += d._3
        if (cum <= alloc(src)) Some((d._1, src, cum)) else None
      }
    }.toSet

    val got = graft.queries.DocQueries.q102TemperatureMix(spark, sf)
      .select("doc_id", "source", "cum_tokens")
      .as[(Long, String, Long)].collect().toSet
    assert(got == expect,
      s"mix diverged: extra=${got -- expect} missing=${expect -- got}")
    assert(got.nonEmpty)
  }

  test("allocations are exact integers that never exceed the budget") {
    import spark.implicits._
    val allocs = graft.queries.DocQueries.q102TemperatureMix(spark, sf)
      .select("source", "alloc_tokens").distinct()
      .as[(String, Long)].collect().toMap
    assert(allocs.values.sum <= 6000L,
      s"floor division must keep the total at or under budget: $allocs")
    val kept = graft.queries.DocQueries.q102TemperatureMix(spark, sf)
      .groupBy("source").agg(sum("n_tokens").as("t"), max("cum_tokens").as("c"))
      .as[(String, Long, Long)].collect()
    kept.foreach { case (src, t, c) =>
      assert(t <= allocs(src), s"$src packed $t > alloc ${allocs(src)}")
      assert(c == t, s"$src cumulative bookkeeping diverged")
    }
  }

  test("alpha=1/2 up-samples the low-resource source") {
    import spark.implicits._
    // 10 000-token source vs 100-token source: equal per-doc quality, so
    // only the temperature rule decides the rates.
    val docs = (1 to 100).map(i => (i.toLong, "big", 100L, 0.5)) ++
      (101 to 102).map(i => (i.toLong, "small", 50L, 0.5))
    val df = docs.toDF("doc_id", "source", "n_tokens", "quality")
      .withColumn("lang", lit("en"))
    val out = graft.queries.DocQueries.temperatureMix(df, 2000L)
      .groupBy("source")
      .agg(max("src_tokens").as("mass"), max("alloc_tokens").as("alloc"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val (bigMass, bigAlloc) = out("big")
    val (smallMass, smallAlloc) = out("small")
    // Sampling rate = alloc/mass must be strictly higher for the small
    // source (sqrt compresses the mass ratio 100:1 to 10:1).
    assert(smallAlloc.toDouble / smallMass > bigAlloc.toDouble / bigMass,
      s"small source not up-sampled: $out")
    // And the big source still gets the larger absolute allocation.
    assert(bigAlloc > smallAlloc, s"absolute ordering inverted: $out")
  }
}
