package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries

/** q159 corpus snapshot diff: every verdict class exercised on a hand
  * fixture (including the mover — same content under a new id reads as
  * delete + add, the contract of an id-keyed diff), census exactness,
  * and the structural identity the registered query must satisfy by
  * construction. */
class CorpusDiffSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def snap(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("all four verdicts, exactly") {
    val a = snap((1L, "s", "keep"), (2L, "s", "edit-me"),
      (3L, "s", "delete-me"), (4L, "s", "move-me"))
    val b = snap((1L, "s", "keep"), (2L, "s", "edited"),
      (40L, "s", "move-me"), (5L, "s", "brand-new"))
    val r = DocQueries.corpusDiff(a, b).collect()(0)
    // added: 40 (mover's new id) + 5; deleted: 3 + 4 (mover's old id);
    // changed: 2; unchanged: 1
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((2L, 2L, 1L, 1L)))
  }

  test("registered diff satisfies its construction counts") {
    val out = DocQueries.q159CorpusDiff(spark, "/root/testdata/sf0.001")
      .agg(sum("n_added").as("a"), sum("n_deleted").as("d"),
        sum("n_changed").as("c"), sum("n_unchanged").as("u"))
      .collect()(0)
    val byMod = graft.sources.Tables(spark, "/root/testdata/sf0.001",
        "documents")
      .groupBy((col("doc_id") % 10).as("m")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.getLong(0) == byMod(7L), "added = the re-keyed movers")
    assert(out.getLong(1) == byMod(3L) + byMod(7L),
      "deleted = dropped docs + movers' old ids")
    assert(out.getLong(2) == byMod(5L), "changed = the re-edited docs")
    val total = byMod.values.sum
    assert(out.getLong(3) == total - byMod(3L) - byMod(5L) - byMod(7L))
  }

  test("diff of a snapshot with itself is all-unchanged") {
    val a = snap((1L, "s", "x"), (2L, "t", "y"))
    val rows = DocQueries.corpusDiff(a, a).collect()
    assert(rows.forall(r => r.getLong(1) == 0 && r.getLong(2) == 0 &&
      r.getLong(3) == 0))
    assert(rows.map(_.getLong(4)).sum == 2)
  }
}
