package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries
import graft.sources.Tables

/** q150 seeded shard export: the census must partition the corpus
  * exactly (no doc lost or double-counted), be reproducible from the
  * seed alone under any partitioning, actually move when the seed
  * moves (a seed that changes nothing isn't seeding anything), and
  * stay balanced the way a content-free hash promises. */
class ShardExportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("shards tile the corpus: counts and chars sum exactly") {
    val out = DocQueries.shardExport(docs, "seed42", 64)
      .agg(sum("n_docs"), sum("n_chars"), count(lit(1))).collect()(0)
    val raw = docs.agg(count(lit(1)), sum("n_chars")).collect()(0)
    assert(out.getLong(0) == raw.getLong(0))
    assert(out.getLong(1) == raw.getLong(1))
    assert(out.getLong(2) == 64L, "an empty shard on the 500-doc fixture " +
      "would mean the hash is not spreading")
  }

  test("layout is reproducible from the seed under any partitioning") {
    val ref = DocQueries.shardExport(docs, "seed42", 64)
      .collect().map(_.toSeq).toList
    for (p <- Seq(1, 3, 16)) {
      val got = DocQueries.shardExport(docs.repartition(p), "seed42", 64)
        .collect().map(_.toSeq).toList
      assert(got == ref, s"diverged at repartition($p)")
    }
  }

  test("a different seed produces a different layout") {
    val a = DocQueries.shardExport(docs, "seed42", 64)
      .collect().map(_.toSeq).toList
    val b = DocQueries.shardExport(docs, "seed43", 64)
      .collect().map(_.toSeq).toList
    assert(a != b)
  }

  test("occupancy stays in the content-free-hash band") {
    val occ = DocQueries.shardExport(docs, "seed42", 64)
      .select("n_docs").collect().map(_.getLong(0))
    // 500 docs over 64 shards: mean 7.8; a content hash (not a key
    // range) keeps every shard within a loose Poisson band
    assert(occ.max <= 25L && occ.min >= 1L,
      s"occupancy ${occ.min}..${occ.max} outside the uniform-hash band")
  }

  test("boundary fingerprints are real docs of their shard") {
    val out = DocQueries.shardExport(docs, "seed42", 64).collect()
    val assign = docs.select(col("doc_id"))
      .withColumn("shard",
        expr("conv(substring(md5(concat('seed42:', cast(doc_id as string))), 1, 14), 16, 10) % 64").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (shard, first, last) = (r.getLong(0), r.getLong(3), r.getLong(4))
      assert(assign(first) == shard && assign(last) == shard,
        s"shard $shard boundary docs assigned elsewhere")
    }
  }
}
