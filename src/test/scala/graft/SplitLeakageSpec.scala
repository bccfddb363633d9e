package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries

/** q161 split-leakage audit: a planted near-dup twin straddling the
  * split boundary is censused as a leak, within-split twins are not
  * leaks, and unrelated documents produce no pairs at all. The split
  * ids are derived from the REAL q123 hash, not assumed. */
class SplitLeakageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Pick doc ids on each side of the q123 boundary by evaluating the
    * actual assignment over a candidate range. */
  private lazy val splitOf: Map[Long, String] = {
    val ids = (0L until 200L).toDF("doc_id")
    DocQueries.splitAssign(ids, 90, 95)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
  }

  private def idIn(split: String, except: Set[Long] = Set.empty): Long =
    (0L until 200L).find(i => splitOf(i) == split && !except(i)).get

  private val base = "alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi"

  test("a cross-split twin is censused as a leak; a within-split twin is not") {
    val tr1 = idIn("train")
    val tr2 = idIn("train", Set(tr1))
    val te = idIn("test")
    val docs = Seq(
      (tr1, base),                           // train original
      (te, base + " rho"),                   // test near-twin -> LEAK
      (tr2, base + " sigma"),                // train near-twin -> no leak
      (idIn("val"), "completely different words about another topic " +
        "with zero shared shingles whatsoever in any ordering"))
      .toDF("doc_id", "text")
    val out = DocQueries.splitLeakageAudit(docs, 0.7, 90, 95).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // the test twin matches BOTH train docs (they are twins of each
    // other too): 2 cross-split pairs, both flagged
    assert(out(("test", "train")) == ((2L, 1L)),
      s"expected exactly the planted cross-split leaks, got $out")
    assert(out(("train", "train"))._2 == 0L, "within-split is not a leak")
    assert(!out.contains(("test", "val")) && !out.contains(("val", "val")),
      "the unrelated document must pair with nothing")
  }

  test("audit is invariant under partitioning") {
    val docs = (0L until 60L)
      .map(i => (i, if (i % 2 == 0) base else base + s" suffix$i word$i"))
      .toDF("doc_id", "text")
    val ref = DocQueries.splitLeakageAudit(docs, 0.7, 90, 95)
      .collect().map(_.toSeq).toList
    val got = DocQueries.splitLeakageAudit(docs.repartition(7), 0.7, 90, 95)
      .collect().map(_.toSeq).toList
    assert(got == ref)
  }
}
