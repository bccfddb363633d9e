package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries

/** The observed quality gate (DocQueries.qualityGateObserved): drop/keep
  * metrics must ride the SAME action that consumes the filtered frame —
  * no second corpus pass — and must reconcile exactly with what an
  * independent recount says.
  */
class ObservationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("gate metrics ride the consuming action and reconcile with a recount") {
    import spark.implicits._
    val (gated, obs) = DocQueries.qualityGateObserved(spark, sf, 0.8)
    // ONE action drives both the result and the metrics.
    val rows = gated.select("doc_id", "n_tokens").as[(Long, Long)].collect()
    val m = obs.get
    assert(m("docs_kept") == rows.length.toLong,
      s"observed kept ${m("docs_kept")} != collected ${rows.length}")
    assert(m("tokens_kept") == rows.map(_._2).sum,
      s"observed token mass must equal the recount")
    val total = graft.sources.Tables(spark, sf, "documents").count()
    assert(m("docs_in") == total,
      s"observed input ${m("docs_in")} != corpus $total — the observe node " +
        "must sit above the filter, seeing every row the scan produces")
    assert(m("docs_in").asInstanceOf[Long] > m("docs_kept").asInstanceOf[Long],
      "fixture sanity: the 0.8 gate should actually drop documents")
  }
}
