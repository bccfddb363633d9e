package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EventQueries

/** The skew probe's salt factors feed real repartition plans, so the
  * integer ceiling-division contract is pinned on a hand-computable
  * fixture: 3 keys with counts 60/30/10 (total 100, uniform share 33⅓)
  * must report exact ratios and salts ⌈cnt·k/total⌉ = 2/1/1. */
class SkewProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("skew ratios and salt factors are exact integer math") {
    import spark.implicits._
    val rows = Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++ Seq.fill(10)("cold")
    val got = EventQueries.skewProbe(rows.toDF("k"), "k", 10)
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(got == Seq(
      ("hot", 60L, 1.8, 2L),    // 60*3/100 = 1.8, ceil = 2
      ("warm", 30L, 0.9, 1L),   // 30*3/100 = 0.9, ceil = 1
      ("cold", 10L, 0.3, 1L)))  // 10*3/100 = 0.3, ceil = 1
  }

  test("count ties break by key — the top-k cut is a total order") {
    import spark.implicits._
    val rows = Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(2)("c")
    val got = EventQueries.skewProbe(rows.toDF("k"), "k", 2)
      .select("k").as[String].collect().toSeq
    assert(got == Seq("a", "b"))
  }
}
