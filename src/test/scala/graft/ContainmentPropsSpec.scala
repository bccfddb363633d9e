package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.queries.DocQueries

/** The load-bearing claim of q66's prefix filter is EXACT recall — every
  * pair brute-force all-pairs containment finds, the filtered join finds
  * too (that is what separates it from the probabilistic MinHash path).
  * Asserted here against an in-memory brute-force reference over random
  * small-vocabulary corpora (small vocabulary makes shared shingles and
  * near-subsets likely), at thresholds below/at/above the fixture's 0.8.
  */
object ContainmentPropsSpec extends Properties("graft.DocQueries.containment") {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Each case runs a 4-join Spark query; 10 keeps the suite fast.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  /** 3-word shingle set of a text — the same tokenization the engine uses. */
  private def shingleSet(text: String): Set[String] = {
    val t = text.trim.toLowerCase.split("\\s+").toSeq
    if (t.size < 3) Set.empty else t.sliding(3).map(_.mkString(" ")).toSet
  }

  /** Brute-force directed containment pairs at threshold t, with the same
    * round-to-4-then-cut the engine and the DuckDB oracle apply. */
  private def brute(docs: Seq[(Long, String)], t: Double): Set[(Long, Long)] = {
    val sh = docs.map { case (id, x) => id -> shingleSet(x) }
      .filter(_._2.nonEmpty)
    for {
      (a, sa) <- sh.toSet[(Long, Set[String])]
      (b, sb) <- sh
      if a != b
      if BigDecimal((sa & sb).size.toDouble / sa.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP) >= t
    } yield (a, b)
  }

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
  private val doc = Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, word))

  property("prefix filter == brute force for any corpus and threshold") =
    forAll(Gen.listOfN(8, doc), Gen.oneOf(0.5, 0.8, 1.0)) {
      (texts: List[List[String]], t: Double) =>
        val docs = texts.zipWithIndex
          .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        val got = DocQueries.containmentJoin(docs.toDF("doc_id", "text"), t)
          .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
        Prop(got == brute(docs, t)) :| s"got $got expected ${brute(docs, t)}"
    }
}
