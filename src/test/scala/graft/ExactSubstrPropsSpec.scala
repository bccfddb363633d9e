package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.queries.DocQueries

/** q93/q96/q97's load-bearing claims, asserted against an in-memory
  * brute-force reference over random SMALL-VOCABULARY corpora (a tiny
  * vocabulary makes cross-doc trigram collisions likely, so every run
  * exercises real spans, merges, and ownership splits — not empty
  * outputs):
  *
  *   - q93 spans: maximal merged intervals over cross-doc duplicated
  *     trigram start positions (merge on overlap OR touch);
  *   - q96 redaction: exactly the tokens covered by some duplicated
  *     trigram occurrence are cut, everything else survives in order;
  *   - q97 keep-one: only non-owner (non-min-doc_id per gram) occurrences
  *     are covered.
  *
  * The reference recomputes all three from first principles (sliding
  * windows + interval merging in plain Scala) — a structurally different
  * computation agreeing on every row. */
object ExactSubstrPropsSpec
    extends Properties("graft.DocQueries.exactSubstr") {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val k = 3
  private val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
  private val doc = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word))
  private val corpus: Gen[List[List[String]]] =
    Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, doc))

  private def grams(t: List[String]): Seq[(String, Int)] =
    if (t.size < k) Seq.empty
    else t.sliding(k).zipWithIndex.map { case (g, i) => (g.mkString(" "), i + 1) }.toSeq

  /** Duplicated start positions per doc under the given covered-position
    * policy (cutAll: every occurrence of a cross-doc duplicated gram;
    * keepOne: only occurrences outside the gram's min-doc_id owner). */
  private def dupStarts(docs: Seq[(Long, List[String])],
                        keepOne: Boolean): Map[Long, Seq[Int]] = {
    val all = docs.flatMap { case (id, t) => grams(t).map { case (g, p) => (g, id, p) } }
    val byGram = all.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2)
    val owner = byGram.map { case (g, xs) => g -> xs.map(_._2).min }
    all.filter { case (g, id, _) =>
      byGram.contains(g) && (!keepOne || owner(g) != id)
    }.groupBy(_._2).map { case (id, xs) => id -> xs.map(_._3).distinct.sorted }
  }

  /** Merge [p, p+k-1] intervals that overlap or touch. */
  private def merge(starts: Seq[Int]): Seq[(Int, Int)] =
    starts.foldLeft(Vector.empty[(Int, Int)]) { case (acc, p) =>
      acc.lastOption match {
        case Some((s, e)) if p <= e + 1 => acc.init :+ (s, math.max(e, p + k - 1))
        case _ => acc :+ (p, p + k - 1)
      }
    }

  private def df(docs: Seq[(Long, List[String])]) =
    docs.map { case (id, t) => (id, t) }.toDF("doc_id", "toks")

  property("spans equal the brute-force maximal merged intervals") =
    forAll(corpus) { c =>
      val docs = c.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val want = dupStarts(docs, keepOne = false).flatMap { case (id, ps) =>
        merge(ps).map { case (s, e) => (id, s.toLong, e.toLong, (e - s + 1).toLong) }
      }.toSet
      val got = DocQueries.exactSubstrSpans(df(docs), k)
        .as[(Long, Long, Long, Long)].collect().toSet
      got == want
    }

  property("cut-all redaction keeps exactly the uncovered tokens, in order") =
    forAll(corpus) { c =>
      val docs = c.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val covered = dupStarts(docs, keepOne = false).map { case (id, ps) =>
        id -> ps.flatMap(p => p until (p + k)).toSet
      }
      val want = docs.map { case (id, t) =>
        val cov = covered.getOrElse(id, Set.empty)
        val kept = t.zipWithIndex.collect { case (w, i) if !cov(i + 1) => w }
        (id, t.size.toLong, kept.size.toLong, kept.mkString(" "))
      }.toSet
      val got = DocQueries.substrRedact(df(docs), k)
        .as[(Long, Long, Long, String)].collect().toSet
      got == want
    }

  property("keep-one redaction spares exactly the min-doc_id owner, per gram") =
    forAll(corpus) { c =>
      val docs = c.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val covered = dupStarts(docs, keepOne = true).map { case (id, ps) =>
        id -> ps.flatMap(p => p until (p + k)).toSet
      }
      val want = docs.map { case (id, t) =>
        val cov = covered.getOrElse(id, Set.empty)
        val kept = t.zipWithIndex.collect { case (w, i) if !cov(i + 1) => w }
        (id, t.size.toLong, kept.size.toLong, kept.mkString(" "))
      }.toSet
      val got = DocQueries.substrRedactKeepOne(df(docs), k)
        .as[(Long, Long, Long, String)].collect().toSet
      got == want
    }
}
