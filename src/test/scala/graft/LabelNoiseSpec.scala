package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EmbedQueries

/** q158 label-noise audit: planted mislabels on the clustered fixture
  * are flagged (a vector carrying another cluster's label sits in a
  * unanimous foreign neighborhood), clean labels are not, and the tie
  * rule abstains — agreeing-minority strictness is what keeps a
  * data-deleting gate conservative. */
class LabelNoiseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("planted mislabels flagged, clean clusters untouched") {
    val dir = ClusteredEmbeddings.ensure(spark)
    val emb = graft.sources.Tables(spark, dir, "embeddings")
    // Clean labels = cluster id; poison: vectors 100 and 117 carry the
    // WRONG cluster's label.
    val labels = emb.select(col("vec_id"),
      when(col("vec_id") === 100L || col("vec_id") === 117L,
        (col("vec_id") % 16 + 1) % 16)
        .otherwise(col("vec_id") % 16).cast("int").as("label"))
    val edges = EmbedQueries.knnGraph(emb, 3)
    val out = EmbedQueries.labelNoiseAudit(edges, labels).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val flaggedTotal = out.values.map(_._2).sum
    // each poisoned vector is flagged under its CARRIED (wrong) label;
    // their unanimous same-cluster neighbors stay clean — at most the
    // LSH-tail vectors (KnnGraphSpec's measured 3) can add flags
    assert(flaggedTotal >= 2 && flaggedTotal <= 5,
      s"flagged $flaggedTotal — expected the 2 planted mislabels " +
        "(+ at most the measured LSH tail)")
    val poisonedLabels = Seq(((100L % 16 + 1) % 16).toInt,
      ((117L % 16 + 1) % 16).toInt)
    poisonedLabels.foreach(l =>
      assert(out(l)._2 >= 1, s"label $l's planted mislabel not flagged"))
  }

  test("ties abstain: a 50/50 neighborhood is not flagged") {
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("vec_id", "nbr_id")
    val labels = Seq((1L, 0), (2L, 0), (3L, 1)).toDF("vec_id", "label")
    val out = EmbedQueries.labelNoiseAudit(edges, labels).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out(0) == 0L, "1 of 2 agreeing is a tie — must abstain")
  }

  test("strict minority flags") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("vec_id", "nbr_id")
    val labels = Seq((1L, 0), (2L, 1), (3L, 1), (4L, 0))
      .toDF("vec_id", "label")
    val out = EmbedQueries.labelNoiseAudit(edges, labels).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out(0) == 1L, "1 of 3 agreeing is a strict minority — flag")
  }
}
