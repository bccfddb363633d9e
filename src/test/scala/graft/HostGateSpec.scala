package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries

/** q144 host-level curation gate: the census must prove the gate from
  * the REAL joined frame, so pin the composition (verdict is exactly
  * q_pass AND a_pass), the gate arithmetic (docs_kept is the raw
  * per-source document count when the verdict passes, zero otherwise —
  * the broadcast join dropped or kept whole hosts, nothing in between),
  * and the relative-bar property that at least one host lands on each
  * side of the quality bar (a mean-relative threshold always splits a
  * non-degenerate corpus). */
class HostGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows = DocQueries.q144HostCurationGate(spark, dir)
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7)))
    .map { case (src, nDocs, qp, ap, v, kept) =>
      src -> ((nDocs, qp, ap, v, kept)) }.toMap

  test("verdict is exactly the conjunction of the two signals") {
    for ((src, (_, qp, ap, v, _)) <- rows) {
      assert(Set(0L, 1L)(qp) && Set(0L, 1L)(ap), s"$src: non-binary signal")
      assert(v == qp * ap, s"$src: verdict $v != $qp AND $ap")
    }
  }

  test("docs_kept is the whole raw host when kept, zero when dropped") {
    val raw = graft.sources.Tables(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, (_, _, _, v, kept)) <- rows) {
      if (v == 1L) assert(kept == raw(src),
        s"$src kept $kept of ${raw(src)} raw docs — hosts gate whole")
      else assert(kept == 0L, s"$src dropped but kept $kept docs")
    }
  }

  test("the mean-relative quality bar splits the corpus") {
    val qs = rows.values.map(_._2).toSet
    assert(qs == Set(0L, 1L),
      "expected hosts on both sides of the corpus-mean quality bar")
  }
}
