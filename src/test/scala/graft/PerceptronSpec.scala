package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior pins for the q125 averaged-perceptron quality classifier:
  * it LEARNS (100% on a lexically separable corpus — the fixture itself
  * carries no lang signal, so the registered query's base-rate accuracy
  * is the honest outcome there), and training is bit-identical under
  * any input partitioning (the all-integer batch-gradient claim). */
class PerceptronSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** A separable two-class corpus: positives speak "signal quality
    * prose", negatives "spam noise junk", over a shared filler
    * vocabulary — the CCNet setup in miniature. */
  private def separable = {
    import spark.implicits._
    val pos = (1 to 30).map(i =>
      (i.toLong, "pos", s"signal quality prose filler$i common words here"))
    val neg = (1 to 30).map(i =>
      (i.toLong + 100, "neg", s"spam noise junk filler$i common words here"))
    (pos ++ neg).toDF("doc_id", "cls", "text")
      .select(col("doc_id"), col("cls"),
        split(lower(trim(col("text"))), "\\s+").as("toks"))
  }

  test("the trainer separates a lexically separable corpus perfectly") {
    import spark.implicits._
    val out = graft.queries.DocQueries
      .perceptronScore(separable, col("cls") === "pos", dims = 256, epochs = 3)
    val acc = out.agg(avg(when(col("correct"), 1.0).otherwise(0.0)))
      .as[Double].collect()(0)
    assert(acc == 1.0, s"separable corpus must classify perfectly, got $acc")
    // Margins must be symmetric in sign, not a majority-class collapse.
    val bySign = out.groupBy("pred").count().as[(Long, Long)].collect().toMap
    assert(bySign(1L) == 30L && bySign(-1L) == 30L, s"collapsed: $bySign")
  }

  test("training is bit-identical under any input partitioning") {
    import spark.implicits._
    val base = separable
    val a = graft.queries.DocQueries
      .perceptronScore(base, col("cls") === "pos", dims = 256, epochs = 3)
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    // A different partitioning AND row order: the memo key is the
    // canonicalized plan, so this trains fresh.
    val b = graft.queries.DocQueries
      .perceptronScore(base.repartition(7).sortWithinPartitions(desc("doc_id")),
        col("cls") === "pos", dims = 256, epochs = 3)
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    assert(a == b, "scores diverged under repartitioning")
  }

  test("a doc with no vocabulary overlap scores exactly the bias weight") {
    import spark.implicits._
    // Words hashing to untouched buckets would confound this, so use the
    // TRAINED model on an empty-token doc: score = bias alone.
    val out = graft.queries.DocQueries
      .perceptronScore(
        separable.unionByName(Seq((999L, "pos"))
          .toDF("doc_id", "cls")
          .withColumn("toks", array().cast("array<string>"))),
        col("cls") === "pos", dims = 256, epochs = 3)
    val row = out.filter(col("doc_id") === 999L)
      .select("score", "pred").as[(Long, Long)].collect()
    // The empty-token doc must flow through the whole train+score path
    // (the fold's seed IS its score — no NULL, no exception) and land a
    // definite verdict.
    assert(row.length == 1, "empty-token doc dropped from output")
    assert(row(0)._2 == 1L || row(0)._2 == -1L)
  }

  test("q130: the stream census is bit-identical to the batch restatement") {
    val sf = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val stream = SparkEntry.queries("q130_stream_model_score")(spark, sf)
      .collect().map(key).toSet
    // Independent batch pass under the SAME shipped weights: all-integer
    // scoring means any micro-batch split of the stream must land on
    // exactly these census cells.
    val w = graft.queries.DocQueries.q125Model(spark, sf)
    val t = split(lower(trim(col("text"))), "\\s+")
    val batch = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"),
        when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
        graft.queries.DocQueries.perceptronScoreOn(w, 256, t).as("score"))
      .withColumn("pred", when(col("score") > 0, 1L).otherwise(-1L))
      .groupBy("source", "pred")
      .agg(count(lit(1)).as("n_docs"), sum("score").as("score_sum"),
        sum(when(col("pred") === col("y"), 1L).otherwise(0L)).as("n_correct"))
      .collect().map(key).toSet
    assert(stream == batch, s"stream census diverged:\n$stream\nvs\n$batch")
  }
}
