package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EmbedQueries

/** The production IVF story end to end: assignment computed once in the
  * write path (corpus stored partitioned by list id), probing served by
  * storage-level partition pruning with zero query-time assignment work.
  * Pins both the RESULT (identical to the inline q46 form) and the PLAN
  * (dynamic partition pruning on the list column; no aggregate in the
  * probe path). */
class IvfWritePathSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"
  private lazy val listsPath = {
    val p = java.nio.file.Files.createTempDirectory("ivf_lists").toString
    EmbedQueries.writeIvfLists(spark, sf, p, nlist = 16)
    p
  }

  test("probe-only path over written lists equals the inline IVF query") {
    val fromLists = EmbedQueries.ivfAnnFromLists(spark, sf, listsPath, 16, 2)
      .collect().map(_.toSeq).toSeq
    val inline = EmbedQueries.ivfAnn(spark, sf, nlist = 16, nProbe = 2)
      .collect().map(_.toSeq).toSeq
    assert(fromLists == inline,
      "write-path IVF must return exactly the inline query's ranking")
  }

  test("the written layout is one directory per list") {
    val dirs = new java.io.File(listsPath).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cid=")).sorted
    assert(dirs.length == 16, s"expected 16 list directories, got ${dirs.toSeq}")
  }

  test("probing prunes list partitions at the storage layer (plan pin)") {
    val plan = EmbedQueries.ivfAnnFromLists(spark, sf, listsPath, 16, 2)
      .queryExecution.executedPlan.toString
    // Dynamic partition pruning: the scan's PartitionFilters carry a
    // runtime predicate on cid fed from the broadcast probe side — the
    // "skipped directories" form of probing.
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on cid in:\n$plan")
    // And the probe path itself must not re-derive assignments: no
    // aggregate anywhere (the inline form has the argmax HashAggregate).
    assert(!plan.contains("HashAggregate"),
      "probe-only path must carry no assignment aggregation")
  }
}
