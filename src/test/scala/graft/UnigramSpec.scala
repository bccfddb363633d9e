package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries

/** q119 unigram-trainer guarantees beyond the value oracle: the EM
  * lands on whole-word pieces when they dominate, the Viterbi
  * segmentations exactly tile the corpus (character-mass conservation),
  * single characters survive every prune, and the result is stable
  * under input partitioning. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def train(docs: Seq[(Long, String)], vocabSize: Int = 40) =
    DocQueries.unigramTrain(
      docs.toDF("doc_id", "text")
        .select(col("doc_id"), lit("en").as("lang"), lit("s").as("source"),
          col("text")),
      maxPieceLen = 6, seedTop = 1000, emRounds = 2,
      vocabSize = vocabSize, maxWordLen = 16)
      .as[(Long, String, Long)].collect().toSeq

  test("EM converges to whole-word pieces on a whole-word corpus") {
    // Single-occurrence sub-pieces cannot beat the word's own seed count
    // under the max-product criterion, so both words segment as
    // themselves in round 1 and the counts lock in.
    val out = train(Seq((1L, "foo bar foo"), (2L, "foo")))
    val byPiece = out.map(t => t._2 -> t._3).toMap
    assert(byPiece("foo") == 3L, s"foo as one piece 3 times: $out")
    assert(byPiece("bar") == 1L, s"bar as one piece once: $out")
    // Whole words rank above every character (chars carry zero usage).
    val ranks = out.map(t => t._2 -> t._1).toMap
    assert(ranks("foo") == 1L && ranks("bar") == 2L)
    out.filter(t => t._2.length == 1).foreach(t =>
      assert(t._3 == 0L, s"char ${t._2} must carry zero usage here"))
  }

  test("character-mass conservation: segmentations exactly tile the corpus") {
    // With an unbounded prune, the output IS the final usage table (plus
    // protected chars), so sum(cnt * len(piece)) must equal the corpus's
    // total character mass — any drift means a word was dropped,
    // double-segmented, or a backtrace terminated early.
    val docs = (0L until 40L).map(i =>
      (i, s"alpha bet${i % 3} gamma${i % 5} d e alphabet"))
    val out = train(docs, vocabSize = 100000)
    val pieceMass = out.map(t => t._3 * t._2.length).sum
    val corpusMass = docs.flatMap(_._2.split("\\s+")).map(_.length.toLong).sum
    assert(pieceMass == corpusMass, s"piece mass $pieceMass != corpus $corpusMass")
  }

  test("every corpus character survives the prune at any vocab size") {
    val docs = Seq((1L, "abcdef ghij klmno pqrst uvwxyz a1b2"))
    val out = train(docs, vocabSize = 3)
    val kept = out.map(_._2).filter(_.length == 1).toSet
    val corpusChars = docs.flatMap(_._2.split("\\s+")).flatMap(_.toSeq)
      .map(_.toString).toSet
    assert(corpusChars.subsetOf(kept),
      s"missing chars: ${corpusChars.diff(kept)}")
  }

  test("q122 encode: bounds and whole-word collapse on the fixture") {
    val out = DocQueries.q122UnigramEncode(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 500)
    out.foreach { case (id, nw, np, nc) =>
      assert(np >= nw && np <= nc,
        s"doc $id: pieces $np outside [words $nw, chars $nc]")
    }
    // The pruned 40-piece vocab holds the frequent whole words and
    // multigraphs, so corpus-wide pieces-per-word must sit well under
    // the char-fallback ceiling (measured 2.65 vs 4.51 on the fixture —
    // the 0.65 band flags a collapse to near-char segmentation, not
    // ordinary drift).
    val (pieces, words, chars) =
      (out.map(_._3).sum.toDouble, out.map(_._2).sum.toDouble, out.map(_._4).sum.toDouble)
    assert(pieces / words < 0.65 * (chars / words),
      f"encoder barely compresses: ${pieces / words}%.2f pieces/word vs ${chars / words}%.2f chars/word")
  }

  test("result is identical under any input partitioning") {
    val docs = (0L until 30L).map(i => (i, s"w${i % 7} common w${(i + 2) % 5}"))
    val base = train(docs)
    for (p <- Seq(1, 7)) {
      val repart = DocQueries.unigramTrain(
        docs.toDF("doc_id", "text")
          .select(col("doc_id"), lit("en").as("lang"), lit("s").as("source"),
            col("text")).repartition(p),
        maxPieceLen = 6, seedTop = 1000, emRounds = 2,
        vocabSize = 40, maxWordLen = 16)
        .as[(Long, String, Long)].collect().toSeq
      assert(repart == base, s"vocab moved under repartition($p)")
    }
  }
}
