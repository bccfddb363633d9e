package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q117 MMR guarantees beyond the value oracle: the distributed
  * round-loop must equal an independent driver-side reference greedy
  * exactly (selection sequence AND scores), rank 1 must be the pure
  * relevance argmax, and the result must actually diversify (picks a
  * lower-relevance candidate over a redundant one somewhere on the
  * fixture — otherwise λ did nothing and the test corpus is too easy to
  * pin the operator). */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private lazy val result = graft.queries.EmbedQueries
    .q117MmrTopk(spark, sf)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getLong(3), r.getLong(4)))

  /** Driver-side reference: rebuild shortlist + sims with independent
    * DataFrame code, then run the greedy as a plain Scala loop. */
  private lazy val reference: Seq[(Long, Long, Long, Long)] = {
    graft.functions.VectorExpressions.register(spark)
    val emb = graft.sources.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val withN = emb.select(col("vec_id"), col("embedding"),
      sqrt(call_function("graft_dot", col("embedding"), col("embedding"))).as("nrm"))
    val vecs = withN.collect()
      .map(r => r.getLong(0) -> (r.getSeq[Float](1).toArray, r.getDouble(2))).toMap
    def cosE6(a: Long, b: Long): Long = {
      val (va, na) = vecs(a); val (vb, nb) = vecs(b)
      var d = 0.0; var i = 0
      while (i < va.length) { d += va(i).toDouble * vb(i).toDouble; i += 1 }
      // BigDecimal.valueOf (shortest-string repr) mirrors Spark's
      // round(x, 6); the exact-binary BigDecimal(double) ctor differs at
      // half-points.
      math.round(BigDecimal(java.math.BigDecimal.valueOf(d / (na * nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
    }
    (0L until 5L).flatMap { q =>
      val short = vecs.keys.filter(_ != q).toSeq
        .map(v => (v, cosE6(q, v))).sortBy(t => (-t._2, t._1)).take(20)
      var selected = Vector.empty[(Long, Long, Long, Long)] // (q, v, score, rank)
      for (r <- 1 to 10) {
        val remaining = short.filterNot(c => selected.exists(_._2 == c._1))
        val scored = remaining.map { case (v, relE6) =>
          val ms = if (selected.isEmpty) 0L
            else selected.map(s => cosE6(v, s._2)).max
          val score = if (selected.isEmpty) 7L * relE6
            else 7L * relE6 - 3L * ms
          (v, score)
        }
        val pick = scored.minBy(t => (-t._2, t._1))
        selected :+= ((q, pick._1, pick._2, r.toLong))
      }
      selected
    }
  }

  test("distributed greedy equals the driver-side reference exactly") {
    val got = result.map(t => (t._1, t._2, t._4, t._5)).toSeq
    assert(got == reference,
      s"first diff: ${got.zip(reference).find(p => p._1 != p._2)}")
  }

  test("rank 1 is the pure-relevance argmax; ranks are 1..10 per query") {
    result.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._5).sorted.toSeq == (1L to 10L))
      val r1 = rows.find(_._5 == 1L).get
      assert(rows.forall(r => r._3 <= r1._3),
        s"q$q rank-1 must carry the max relevance")
    }
  }

  test("λ bites: some round prefers a less-relevant, less-redundant candidate") {
    val reordered = result.groupBy(_._1).values.exists { rows =>
      val byRank = rows.sortBy(_._5).map(_._3)
      byRank.zip(byRank.tail).exists { case (a, b) => b > a }
    }
    assert(reordered,
      "MMR order equals pure relevance order everywhere — fixture cannot pin the operator")
  }
}
