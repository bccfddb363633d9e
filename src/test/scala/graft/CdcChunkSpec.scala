package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries

/** q141 content-defined chunking: chunks tile the document exactly, and
  * the defining CDC property holds — after an INSERTION at the front,
  * boundaries re-synchronize because they depend on content, so almost
  * every chunk is shared with the original; fixed-size (offset-based)
  * blocking shares almost nothing under the same edit. */
class CdcChunkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fixtureDocs = graft.sources.Tables(
    spark, "/root/testdata/sf0.001", "documents")
    .select(col("doc_id"), col("source"), lower(trim(col("text"))).as("txt"))

  test("chunks tile each document: lengths sum to n, no overlap possible") {
    val docs = fixtureDocs
    val lens = DocQueries.cdcChunks(docs)
      .groupBy("doc_id").agg(sum(length(col("chunk"))).as("rebuilt"))
    val bad = docs.select(col("doc_id"), length(col("txt")).as("n"))
      .join(lens, "doc_id")
      .filter(col("rebuilt") =!= col("n")).count()
    assert(bad == 0, s"$bad documents whose chunks do not tile the text")
  }

  test("sub-window documents are stored as one whole chunk; empty docs none") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s", "short doc"),                    // 9 chars < window
      (2L, "s", ""),                             // empty: stores nothing
      (3L, "s", "exactly sixteen!")              // n == 16: one boundary at n
    ).toDF("doc_id", "source", "txt")
    val got = DocQueries.cdcChunks(docs)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(got == Set((1L, "short doc"), (3L, "exactly sixteen!")))
  }

  test("insertion resync: a prepended char leaves >90% of chunks shared") {
    val docs = fixtureDocs
    val orig = DocQueries.cdcChunks(docs)
      .groupBy("doc_id", "chunk").agg(count(lit(1)).as("c0"))
    val twin = DocQueries.cdcChunks(
      docs.withColumn("txt", concat(lit("X"), col("txt"))))
      .groupBy("doc_id", "chunk").agg(count(lit(1)).as("c1"))
    val agg = orig.join(twin, Seq("doc_id", "chunk"), "left")
      .agg(sum("c0").as("total"),
        sum(when(col("c1").isNotNull, least(col("c0"), col("c1")))
          .otherwise(0L)).as("shared"))
      .collect()(0)
    val (total, shared) = (agg.getLong(0), agg.getLong(1))
    assert(shared.toDouble / total > 0.9,
      s"CDC resync failed: only $shared of $total chunks survive a prepend")
  }

  test("fixed-size blocking shares almost nothing under the same edit") {
    val docs = fixtureDocs
    def fixedBlocks(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id"),
        explode(sequence(lit(0L),
          expr("(cast(length(txt) as bigint) - 1) div 32"))).as("b"),
        col("txt"))
      .select(col("doc_id"), expr("substring(txt, b * 32 + 1, 32)").as("chunk"))
    val orig = fixedBlocks(docs)
      .groupBy("doc_id", "chunk").agg(count(lit(1)).as("c0"))
    val twin = fixedBlocks(docs.withColumn("txt", concat(lit("X"), col("txt"))))
      .groupBy("doc_id", "chunk").agg(count(lit(1)).as("c1"))
    val agg = orig.join(twin, Seq("doc_id", "chunk"), "left")
      .agg(sum("c0").as("total"),
        sum(when(col("c1").isNotNull, least(col("c0"), col("c1")))
          .otherwise(0L)).as("shared"))
      .collect()(0)
    val frac = agg.getLong(1).toDouble / agg.getLong(0)
    assert(frac < 0.2,
      f"offset blocking unexpectedly robust ($frac%.2f shared) — the CDC contrast is void")
  }
}
