package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.queries.DocQueries

/** q90's load-bearing claim is that the closed-form integer computation
  * (absent-token mass folded into N·n_s, decimal product sums) equals the
  * textbook TV distance ½·Σ_w |p_s(w) − p(w)| over the FULL vocabulary —
  * including tokens a source never emits. Asserted against a brute-force
  * reference that iterates every (source, token) cell of the grid the
  * engine deliberately never materializes. */
object TvDriftPropsSpec extends Properties("graft.DocQueries.tvDrift") {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private def tokens(text: String): Seq[String] = {
    val t = text.trim.toLowerCase
    if (t.isEmpty) Seq("") else t.split("\\s+").toSeq
  }

  /** Brute-force TV over the full source×vocabulary grid, rounded like
    * the engine's output column. */
  private def brute(docs: Seq[(String, String)]): Map[String, (Long, BigDecimal)] = {
    val toks = docs.map { case (src, text) => src -> tokens(text) }
    val vocab = toks.flatMap(_._2).distinct
    val corpus = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = corpus.values.sum
    toks.groupBy(_._1).map { case (src, rows) =>
      val own = rows.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ns = own.values.sum
      val num = vocab.map { w =>
        (BigInt(own.getOrElse(w, 0L)) * n - BigInt(corpus(w)) * ns).abs
      }.sum
      val tv = BigDecimal(num) / (BigDecimal(2) * BigDecimal(n) * BigDecimal(ns))
      src -> (ns, tv.setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }
  }

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta")
  private val src = Gen.oneOf("s1", "s2", "s3")
  private val doc = for {
    s <- src
    n <- Gen.chooseNum(1, 10)
    ws <- Gen.listOfN(n, word)
  } yield (s, ws.mkString(" "))

  property("closed-form integer TV == full-grid brute force") =
    forAll(Gen.listOfN(8, doc)) { docs: List[(String, String)] =>
      val df = docs.zipWithIndex
        .map { case ((s, t), i) => (i.toLong, t, s) }
        .toDF("doc_id", "text", "source")
      val got = DocQueries.sourceTvDrift(df)
        .as[(String, Long, Double)].collect()
        .map { case (s, n, tv) =>
          s -> (n, BigDecimal(tv).setScale(6, BigDecimal.RoundingMode.HALF_UP)) }
        .toMap
      val want = brute(docs)
      Prop(got == want) :| s"got $got expected $want"
    }
}
