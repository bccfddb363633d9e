package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.GraphQueries

/** q134 PageRank guarantees: exact integer iteration means the ranks are
  * bit-identical under every partitioning (not approximately — the spec
  * is equality); mass is conserved up to integer-division truncation;
  * the hub of a star graph outranks its spokes; dangling mass is
  * redistributed, not dropped.
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def star = {
    // hub 0 <-> spokes 1..4, plus a dangling node 9 (no out-edges, one
    // inbound from spoke 4) — the shape a crawl graph always has.
    val e = Seq((0L, 1L), (1L, 0L), (0L, 2L), (2L, 0L), (0L, 3L), (3L, 0L),
      (0L, 4L), (4L, 0L), (4L, 9L)).toDF("src", "dst")
    val n = Seq(0L, 1L, 2L, 3L, 4L, 9L).toDF("node")
    (e, n)
  }

  test("hub outranks spokes; dangling node keeps redistributed mass") {
    val (e, n) = star
    val r = GraphQueries.pageRank(e, n, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > r(1L), "hub must outrank a spoke")
    assert(Seq(1L, 2L, 3L).forall(s => r(s) == r(1L)),
      "symmetric spokes must tie exactly")
    assert(r(9L) > 0L, "dangling node keeps base + inbound mass")
    assert(r(4L) >= r(1L), "spoke 4 receives the same hub share as a " +
      "plain spoke (out-degree affects what it SENDS, not receives)")
  }

  test("ranks are bit-identical under every partitioning") {
    val (e, n) = star
    val ref = GraphQueries.pageRank(e, n, iters = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1).toList
    for (p <- Seq(1, 3, 16)) {
      val got = GraphQueries.pageRank(e.repartition(p), n.repartition(p), 3)
        .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1).toList
      assert(got == ref, s"diverged at repartition($p)")
    }
  }

  test("mass conserved up to integer-division truncation") {
    val (e, n) = star
    val total = GraphQueries.pageRank(e, n, iters = 3)
      .agg(sum("rank_ppb")).collect()(0).getLong(0)
    // each of the N nodes can lose < 1000 ppb to the three divisions
    // per round; three rounds, six nodes
    assert(total <= 1000000000L)
    assert(total > 1000000000L - 3 * 6 * 3000L)
  }

  test("trustrank: unreachable nodes score exactly 0, reachable gain trust") {
    import spark.implicits._
    // component A: 0 <-> 1; component B: 2 <-> 3. Seed only node 0.
    val e = Seq((0L, 1L), (1L, 0L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val n = Seq(0L, 1L, 2L, 3L).toDF("node")
    val seeds = Seq(0L).toDF("node")
    val r = GraphQueries.pageRankSeeded(e, n, seeds, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > 0L && r(1L) > 0L, "trust flows along edges from the seed")
    assert(r(2L) == 0L && r(3L) == 0L,
      "nodes unreachable from the seed set must score exactly 0")
  }

  test("seeding every node recovers classic PageRank term for term") {
    val (e, n) = star
    val uniform = GraphQueries.pageRank(e, n, iters = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1).toList
    val seededAll = GraphQueries.pageRankSeeded(e, n, n, iters = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1).toList
    assert(uniform == seededAll)
  }

  test("q134 ranks a real co-supply graph: positive, node-complete") {
    val dir = "/root/testdata/sf0.001"
    val out = GraphQueries.q134PagerankSuppliers(spark, dir).collect()
    val nSupp = graft.sources.Tables(spark, dir, "lineitem")
      .select("l_suppkey").distinct().count()
    assert(out.length == nSupp, "one rank row per supplier in the graph")
    assert(out.forall(_.getLong(1) > 0L), "every rank positive")
  }
}
