package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.core

/** The claim behind q85: Morton bucketing bounds BOTH dimensions' spans
  * per bucket (the file-skipping property), where lexicographic
  * bucketing bounds only its leading column. Measured on the lineitem
  * fixture, not argued — plus bit-level unit checks of the interleave.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("mortonInterleave16 interleaves bits (known vectors)") {
    val rows = Seq(
      (0L, 0L, 0L),
      (1L, 0L, 1L),               // bit 0 of a -> position 0
      (0L, 1L, 2L),               // bit 0 of b -> position 1
      (3L, 0L, 5L),               // a=0b11 -> 0b101
      (0L, 3L, 10L),              // b=0b11 -> 0b1010
      (0xFFFFL, 0L, 0x55555555L), // all a-bits -> even positions
      (0L, 0xFFFFL, 0xAAAAAAAAL), // all b-bits -> odd positions
      (0xFFFFL, 0xFFFFL, 0xFFFFFFFFL))
    val got = rows.toDF("a", "b", "want")
      .select(core.mortonInterleave16(col("a"), col("b")).as("got"), col("want"))
      .as[(Long, Long)].collect()
    got.foreach { case (g, w) => assert(g == w, f"got 0x$g%x want 0x$w%x") }
  }

  test("morton order preserves locality: adjacent keys differ in one dim step") {
    // Walk the 4x4 grid in Morton order of 2-bit coords: consecutive
    // cells are never far in BOTH dims at once (max step 3, vs 2^16 for
    // row-major wraparound) — spot the first 16 keys are the Z curve.
    val keys = for (b <- 0L until 4L; a <- 0L until 4L) yield (a, b)
    val sorted = keys.toDF("a", "b")
      .select(col("a"), col("b"),
        core.mortonInterleave16(col("a"), col("b")).as("m"))
      .orderBy("m").as[(Long, Long, Long)].collect()
    assert(sorted.map(_._3).toSeq == (0L until 16L),
      s"2-bit Morton keys must enumerate 0..15: ${sorted.mkString(",")}")
    assert(sorted.take(4).map(t => (t._1, t._2)).toSeq ==
      Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L)),
      "the curve must start with the 2x2 sub-square (the Z shape)")
  }

  test("q85 layout: every Morton bucket bounds BOTH spans; lexicographic does not") {
    val dir = "/root/testdata/sf0.001"
    val audit = SparkEntry.queries("q85_zorder_layout")(spark, dir).collect()
    val li = graft.sources.Tables(spark, dir, "lineitem")
    val (maxPk, maxSk) = li
      .agg(max("l_partkey"), max("l_suppkey"))
      .as[(Long, Long)].collect().head
    // 64 buckets = top 3 bits of each 16-bit dim = an 8x8 grid; each
    // bucket's raw-key span is at most ceil(domain/8) (+1 for the
    // normalization floor).
    val pkBound = (maxPk + 1) / 8 + 1
    val skBound = (maxSk + 1) / 8 + 1
    audit.foreach { r =>
      val (b, pkSpan, skSpan) =
        (r.getAs[Long]("bucket"), r.getAs[Long]("pk_span"), r.getAs[Long]("sk_span"))
      assert(pkSpan <= pkBound && skSpan <= skBound,
        s"bucket $b spans ($pkSpan, $skSpan) exceed grid bounds ($pkBound, $skBound)")
    }
    // The contrast that makes Z-order worth its sort: bucket the SAME
    // rows lexicographically (by partkey range alone, same 64 buckets) —
    // partkey tightens but suppkey spans nearly its whole domain in
    // every populated bucket, so a suppkey predicate prunes nothing.
    val lex = li
      .crossJoin(broadcast(li.agg(max(col("l_partkey")).as("max_pk"))))
      .withColumn("bucket", expr("l_partkey * 64 div (max_pk + 1)"))
      .groupBy("bucket")
      .agg((max("l_suppkey") - min("l_suppkey")).as("sk_span"))
      .agg(min("sk_span")).as[Long].collect().head
    assert(lex > maxSk / 2,
      s"lexicographic buckets should span suppkey (min span $lex vs domain $maxSk)")
    val zMaxSk = audit.map(_.getAs[Long]("sk_span")).max
    assert(zMaxSk * 2 < lex,
      s"Z-order worst suppkey span ($zMaxSk) must beat lexicographic best ($lex) by 2x+")
  }

  test("file skipping end to end: the audit manifest prunes the physical scan") {
    // The write path q85's scaladoc describes, executed: rows land in
    // files by Morton bucket, the audit output doubles as the per-file
    // min/max manifest, and a dimension predicate reads ONLY the files
    // whose stats admit it — same rows, measured-fewer files.
    val dir = "/root/testdata/sf0.001"
    val li = graft.sources.Tables(spark, dir, "lineitem")
    val mx = li.agg(max(col("l_partkey")).as("max_pk"),
      max(col("l_suppkey")).as("max_sk"))
    val keyed = li
      .crossJoin(broadcast(mx))
      .withColumn("pk16", expr("l_partkey * 65536 div (max_pk + 1)"))
      .withColumn("sk16", expr("l_suppkey * 65536 div (max_sk + 1)"))
      .withColumn("bucket",
        shiftright(core.mortonInterleave16(col("pk16"), col("sk16")), 26))
      .drop("pk16", "sk16", "max_pk", "max_sk")
    val out = s"${sys.props("user.dir")}/target/etl/zorder_spec/lineitem_z"
    keyed.write.mode("overwrite").partitionBy("bucket").parquet(out)

    val manifest = SparkEntry.queries("q85_zorder_layout")(spark, dir)
      .select("bucket", "sk_min", "sk_max").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (maxSk, lo) = (manifest.map(_._3).max, 2L)
    val hi = lo + maxSk / 8 // a ~1/8-domain suppkey range predicate
    val admitted = manifest.filter(m => m._3 >= lo && m._2 <= hi).map(_._1)
    assert(admitted.length <= 16,
      s"a 1/8-domain range must admit ~1 grid row of buckets, got ${admitted.length}/64")

    val zread = spark.read.parquet(out)
    val pruned = zread
      .filter(col("bucket").isin(admitted: _*) &&
        col("l_suppkey") >= lo && col("l_suppkey") <= hi)
    val full = zread.filter(col("l_suppkey") >= lo && col("l_suppkey") <= hi)
    assert(pruned.count() == full.count(),
      "manifest pruning must not change the result")
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val scan = df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
        .getOrElse(fail("no file scan in plan"))
      scan.metrics("numFiles").value
    }
    val (fPruned, fFull) = (filesRead(pruned), filesRead(full))
    assert(fPruned * 3 <= fFull,
      s"manifest pruning must cut files read 3x+ (pruned $fPruned vs full $fFull)")
  }
}
