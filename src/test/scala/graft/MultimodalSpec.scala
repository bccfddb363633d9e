package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Multimodal
import graft.functions.Multimodal.MediaBlob

/** The multimodal plumbing contract: schema, determinism, batch shape, and
  * agreement with the SQL-side metadata query (q29). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def blob(id: Long, s: String) =
    MediaBlob(id, "text/plain", s.getBytes("UTF-8"))

  test("extractFeatures is deterministic and preserves ids/byte counts") {
    val ds = Seq(blob(1, "hello world"), blob(2, "x" * 1000)).toDS()
    val out1 = Multimodal.extractFeatures(ds).collect().sortBy(_.doc_id)
    val out2 = Multimodal.extractFeatures(ds).collect().sortBy(_.doc_id)
    assert(out1.map(_.doc_id).toSeq == Seq(1L, 2L))
    assert(out1(0).n_bytes == 11 && out1(1).n_bytes == 1000)
    // 1000 bytes / 256-byte frames → 4 frames; 11 bytes → 1 frame
    assert(out1(0).frames.length == 1 && out1(1).frames.length == 4)
    assert(out1.map(_.checksum).toSeq == out2.map(_.checksum).toSeq)
    assert(out1.zip(out2).forall { case (a, b) => a.frames.sameElements(b.frames) })
  }

  test("checksum matches Spark SQL md5 (q29 agreement)") {
    val ds = Seq(blob(7, "some payload")).toDS()
    val fromUdfPath = Multimodal.extractFeatures(ds).collect().head.checksum
    val fromSql = spark.sql("SELECT md5(encode('some payload', 'UTF-8')) AS m")
      .collect().head.getString(0)
    assert(fromUdfPath == fromSql)
  }

  test("batching never drops or duplicates rows at partition boundaries") {
    val ds = (1L to 301L).map(i => blob(i, s"doc$i")).toDS().repartition(7)
    val out = Multimodal.extractFeatures(ds, batchSize = 10).collect()
    assert(out.map(_.doc_id).sorted.toSeq == (1L to 301L))
  }
}
