package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EmbedQueries

/** q156 embedding drift monitor: planted geometry — identical halves
  * read cos 1.0, negated halves −1.0, orthogonal halves 0.0; means are
  * true integer means (not sums), negative components take the
  * sign-split division, and the whole monitor is partition-invariant. */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vec(head: Float*) =
    (head ++ Seq.fill(64 - head.length)(0f)).toSeq

  /** parity 0 = even vec_id, parity 1 = odd. */
  private def fixture = Seq(
    // label 0: both halves on +x -> cos exactly 1
    (0L, 0, vec(1f)), (1L, 0, vec(1f)),
    // label 1: odd half flipped -> cos exactly -1
    (10L, 1, vec(1f)), (11L, 1, vec(-1f)),
    // label 2: orthogonal halves -> cos exactly 0
    (20L, 2, vec(1f)), (21L, 2, vec(0f, 1f)),
    // label 3: even mean of [2,0..] and [4,0..] is 3 -> cos 1 vs [3,0..]
    (30L, 3, vec(2f)), (32L, 3, vec(4f)), (31L, 3, vec(3f)),
    // label 4: negative components on both sides -> cos 1 (sign-split
    // division must not skew the means)
    (40L, 4, vec(-1f, -2f)), (41L, 4, vec(-1f, -2f)))
    .toDF("vec_id", "label", "embedding")
    .select(col("vec_id"), col("label"),
      col("embedding").cast("array<float>").as("embedding"))

  test("planted geometry: identical 1.0, negated -1.0, orthogonal 0.0") {
    val got = EmbedQueries.embeddingDrift(fixture).collect()
      .map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(got(0) == 1.0 && got(1) == -1.0 && got(2) == 0.0)
    assert(got(3) == 1.0, "integer mean of {2,4} must be 3, cos 1 vs {3}")
    assert(got(4) == 1.0, "negative components must survive sign-split div")
  }

  test("counts split by parity, not by arrival order") {
    val got = EmbedQueries.embeddingDrift(fixture).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(3) == ((2L, 1L)))
    assert(got(0) == ((1L, 1L)))
  }

  test("monitor is bit-identical under every partitioning") {
    val ref = EmbedQueries.embeddingDrift(fixture)
      .collect().map(_.toSeq).toList
    for (p <- Seq(1, 3, 16)) {
      val got = EmbedQueries.embeddingDrift(fixture.repartition(p))
        .collect().map(_.toSeq).toList
      assert(got == ref, s"diverged at repartition($p)")
    }
  }
}
