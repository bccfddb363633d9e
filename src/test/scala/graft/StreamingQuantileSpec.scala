package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** q168 streaming quantile monitor: the load-bearing properties are
  * (1) BOUNDED STATE — the sketch keeps ≤ k pairs per source in the
  * state store where exact streaming percentiles would buffer every
  * value ever seen; (2) micro-batch-slicing INVARIANCE — the bottom-k
  * set is order-free, so a 2-batch run lands on the 1-batch run's
  * census exactly (which is why the batch relational restatement can
  * serve as the stream's oracle); (3) the registered replay equals the
  * batch computation frame-for-frame. */
class StreamingQuantileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("registered q168 replay equals the batch sketch census") {
    graft.functions.QuantileSketch.register(spark)
    val streamed = graft.queries.StreamQueries
      .q168StreamQuantileMonitor(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toList
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001",
      "documents")
    val hv = expr("CAST(conv(substring(md5(concat('btk:', CAST(doc_id AS STRING))), 1, 14), 16, 10) AS BIGINT)")
    def pick(pct: Int) =
      element_at(col("vs"), expr(s"(m * $pct + 99) div 100").cast("int"))
    val batch = docs.select(col("source"), hv.as("hv"), col("n_chars"))
      .groupBy("source")
      .agg(expr("graft_btk_pairs(hv, n_chars, 64)").as("pairs"))
      .select(col("source"), size(col("pairs")).as("m"),
        expr("array_sort(transform(pairs, p -> p.v))").as("vs"))
      .select(col("source"), col("m").cast("long").as("m"),
        pick(25).as("p25_est"), pick(50).as("p50_est"),
        pick(75).as("p75_est"))
      .orderBy("source")
      .collect().map(_.toSeq).toList
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("micro-batch slicing invariance: 2-batch census equals 1-batch") {
    graft.functions.QuantileSketch.register(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rows = (0L until 2000L)
      .map(i => (s"s${i % 3}", (i * 2654435761L) % 1000003L, i % 613L))

    def run(blocks: Seq[Seq[(String, Long, Long)]]): List[Seq[Any]] = {
      val ms = MemoryStream[(String, Long, Long)]
      val df = ms.toDF().toDF("source", "hv", "v")
        .groupBy("source")
        .agg(expr("graft_btk_pairs(hv, v, 64)").as("pairs"))
        .select(col("source"), size(col("pairs")).cast("long").as("m"))
      val name = s"q168_spec_${blocks.size}_${System.nanoTime()}"
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.ProcessingTime(0)).start()
      try {
        blocks.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
        spark.table(name).orderBy("source")
          .collect().map(_.toSeq).toList
      } finally q.stop()
    }

    val oneBatch = run(Seq(rows))
    val twoBatch = run(Seq(rows.take(700), rows.drop(700)))
    assert(oneBatch.nonEmpty && oneBatch == twoBatch)
    // bounded state: every source's held sample is capped at k
    oneBatch.foreach { r =>
      assert(r(1).asInstanceOf[Long] <= 64L)
    }
  }
}
