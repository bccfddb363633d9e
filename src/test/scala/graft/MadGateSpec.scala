package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries

/** q152 MAD outlier gate: exact lower-median/MAD arithmetic on a hand
  * fixture, the ROBUSTNESS property the gate exists for (a pair of
  * masked outliers that a mean±3σ gate misses — they inflate σ enough
  * to hide under it — while median/MAD flags both), and partition
  * invariance of the whole two-level rank pipeline. */
class MadGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def df(rows: (Long, String, Long)*) =
    rows.toDF("doc_id", "source", "n_chars")

  test("lower median and MAD are the exact ranked rows") {
    // [10,10,10,10,100]: median = rank-3 value 10; devs [0,0,0,0,90]:
    // MAD = rank-3 value 0; gate dev > 3*0 flags only the 100.
    val out = DocQueries.madOutlierGate(
      df((1L, "s", 10L), (2L, "s", 10L), (3L, "s", 10L), (4L, "s", 10L),
        (5L, "s", 100L)), 3L).collect()(0)
    assert((out.getLong(1), out.getLong(2), out.getLong(3),
      out.getLong(4)) == ((5L, 10L, 0L, 1L)))
  }

  test("even count takes the LOWER median, deterministically") {
    // [1,2,3,4]: rank (4+1) div 2 = 2 -> median 2 (not 2.5 — the
    // statistic must be a concrete row, the cross-engine contract)
    val out = DocQueries.madOutlierGate(
      df((1L, "s", 1L), (2L, "s", 2L), (3L, "s", 3L), (4L, "s", 4L)), 3L)
      .collect()(0)
    assert(out.getLong(2) == 2L)
  }

  test("masked outliers: MAD flags what a mean±3σ gate hides") {
    // 8 docs at 100 chars + 2 at 10 000: the outliers drag the mean to
    // 2 080 and inflate σ to ~3 960, so mean+3σ ≈ 13 960 hides both.
    val rows = (1L to 8L).map(i => (i, "s", 100L)) ++
      Seq((9L, "s", 10000L), (10L, "s", 10000L))
    val vals = rows.map(_._3.toDouble)
    val mean = vals.sum / vals.size
    val sigma = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / vals.size)
    val meanGateFlags = vals.count(v => math.abs(v - mean) > 3 * sigma)
    assert(meanGateFlags == 0, "fixture must mask the outliers from 3σ")
    val out = DocQueries.madOutlierGate(df(rows: _*), 3L).collect()(0)
    assert(out.getLong(4) == 2L,
      s"MAD gate flagged ${out.getLong(4)} of the 2 masked outliers")
  }

  test("gate is bit-identical under every partitioning") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001",
        "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val ref = DocQueries.madOutlierGate(docs, 3L)
      .collect().map(_.toSeq).toList
    for (p <- Seq(1, 3, 16)) {
      val got = DocQueries.madOutlierGate(docs.repartition(p), 3L)
        .collect().map(_.toSeq).toList
      assert(got == ref, s"diverged at repartition($p)")
    }
  }
}
