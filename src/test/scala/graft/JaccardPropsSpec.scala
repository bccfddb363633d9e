package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.queries.DocQueries

/** q87's load-bearing claim is EXACT recall for symmetric Jaccard — the
  * containment-candidate superset argument (J(A,B) ≤ |A∩B|/|A|) plus the
  * length filter must lose NO qualifying pair. Asserted against an
  * in-memory brute-force all-pairs reference over random small-vocabulary
  * corpora (small vocabulary makes overlapping shingle sets likely), at
  * thresholds below/at/above the fixture's 0.5, including t = 1.0 where
  * the length filter collapses to |A| = |B|. The engine cuts on the
  * UNROUNDED ratio (q66's hairline-band rule) — the reference does too.
  */
object JaccardPropsSpec extends Properties("graft.DocQueries.jaccard") {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private def shingleSet(text: String): Set[String] = {
    val t = text.trim.toLowerCase.split("\\s+").toSeq
    if (t.size < 3) Set.empty else t.sliding(3).map(_.mkString(" ")).toSet
  }

  /** Brute-force unordered pairs with unrounded J ≥ t, plus the
    * round-to-4 output value the engine reports. */
  private def brute(docs: Seq[(Long, String)],
                    t: Double): Set[(Long, Long, BigDecimal)] = {
    val sh = docs.map { case (id, x) => id -> shingleSet(x) }
      .filter(_._2.nonEmpty)
    for {
      (a, sa) <- sh.toSet[(Long, Set[String])]
      (b, sb) <- sh
      if a < b
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= t
    } yield (a, b,
      BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP))
  }

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
  private val doc = Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, word))

  property("prefix filter + length cut == brute force for any corpus and threshold") =
    forAll(Gen.listOfN(8, doc), Gen.oneOf(0.3, 0.5, 1.0)) {
      (texts: List[List[String]], t: Double) =>
        val docs = texts.zipWithIndex
          .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        val got = DocQueries.jaccardJoin(docs.toDF("doc_id", "text"), t)
          .select("doc_a", "doc_b", "jaccard")
          .as[(Long, Long, Double)].collect()
          .map { case (a, b, j) =>
            (a, b, BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP)) }
          .toSet
        val want = brute(docs, t)
        Prop(got == want) :| s"got $got expected $want"
    }
}
