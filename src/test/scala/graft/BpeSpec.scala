package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior pins for the distributed BPE trainer (q104) beyond the
  * unrolled DuckDB oracle: full-run equality against an independent
  * in-memory reference implementation, the greedy-overlap merge rule,
  * and the property that makes BPE BPE — merged symbols participate in
  * later merges. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Sennrich et al.'s algorithm, straight-line Scala: overlapping pair
    * counts weighted by word frequency, lexicographic tie-break, greedy
    * left-to-right non-overlapping merge application. */
  private def reference(words: Map[String, Long], n: Int)
      : Seq[(Long, String, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, f) => w.split("").filter(_.nonEmpty).toVector -> f }
    val out = scala.collection.mutable.ListBuffer
      .empty[(Long, String, String, String, Long)]
    for (step <- 1 to n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.minBy { case ((x, y), m) => (-m, x, y) }
        out += ((step.toLong, a, b, a + b, c))
        def merge(s: Vector[String]): Vector[String] = {
          val r = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
              r += a + b; i += 2
            } else { r += s(i); i += 1 }
          }
          r.result()
        }
        vocab = vocab.groupMapReduce { case (s, _) => merge(s) } { case (_, f) => f }(_ + _)
      }
    }
    out.toSeq
  }

  test("q104 equals the reference implementation for all 10 merges") {
    import spark.implicits._
    val words = graft.sources.Tables(spark, sf, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .as[(String, Long)].collect().toMap
    val expect = reference(words, 10)
    val got = graft.queries.DocQueries.q104BpeTrain(spark, sf)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got == expect, s"merge tables diverged:\n got=$got\n exp=$expect")
    // The property that makes BPE BPE: at least one later merge consumes
    // an earlier merge's output symbol.
    assert(got.exists { case (_, a, b, _, _) => a.length > 1 || b.length > 1 },
      s"no hierarchical merge in 10 steps — suspicious: $got")
  }

  test("merge application is greedy left-to-right non-overlapping") {
    import spark.implicits._
    // 'aaaa' x3: pair (a,a) counts 3 overlapping positions x 3 = 9.
    // Greedy merge yields 'aa','aa' (never 'a','aa','a' or overlap).
    // Step 2 must then see (aa,aa) with count 3 — only true under the
    // non-overlapping rule.
    val docs = Seq((1L, "aaaa aaaa aaaa", "en", "s0", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.queries.DocQueries.bpeMerges(docs, 2)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", "a", "aa", 9L), (2L, "aa", "aa", "aaaa", 3L)),
      s"got $got")
  }

  test("q107 WordPiece equals the reference with the likelihood-ratio argmax") {
    import spark.implicits._
    val words = graft.sources.Tables(spark, sf, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .as[(String, Long)].collect().toMap
    // Independent restatement: per-round unigram counts and the
    // c(ab)/(c(a)c(b)) argmax, ties lexicographic.
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, f) => w.split("").filter(_.nonEmpty).toVector -> f }
    val expect = scala.collection.mutable.ListBuffer
      .empty[(Long, String, String, Long)]
    for (step <- 1 to 10) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      val uc = scala.collection.mutable.Map.empty[String, Long]
      vocab.foreach { case (syms, f) =>
        syms.foreach(sym => uc(sym) = uc.getOrElse(sym, 0L) + f)
        syms.sliding(2).foreach {
          case Vector(a, b) => pc((a, b)) = pc.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (pc.nonEmpty) {
        val ((a, b), c) = pc.minBy { case ((x, y), m) =>
          (-(m.toDouble / (uc(x) * uc(y))), x, y)
        }
        expect += ((step.toLong, a, b, c))
        def merge(sv: Vector[String]): Vector[String] = {
          val r = Vector.newBuilder[String]; var i = 0
          while (i < sv.length) {
            if (i + 1 < sv.length && sv(i) == a && sv(i + 1) == b) {
              r += a + b; i += 2
            } else { r += sv(i); i += 1 }
          }
          r.result()
        }
        vocab = vocab.groupMapReduce { case (sv, _) => merge(sv) } { case (_, f) => f }(_ + _)
      }
    }
    val got = graft.queries.DocQueries.q107WordpieceTrain(spark, sf)
      .select("step", "lhs", "rhs", "pair_count")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == expect.toSeq, s"wordpiece diverged:\n got=$got\n exp=${expect.toSeq}")
  }

  test("the two criteria pick DIFFERENT first merges on the fixture") {
    import spark.implicits._
    // BPE merges what is frequent; WordPiece what is surprisingly
    // frequent. If the fixture ever degenerates so both pick the same
    // pair, the two trainers no longer demonstrate distinct criteria.
    val bpe1 = graft.queries.DocQueries.q104BpeTrain(spark, sf)
      .filter(col("step") === 1).select("lhs", "rhs")
      .as[(String, String)].head()
    val wp1 = graft.queries.DocQueries.q107WordpieceTrain(spark, sf)
      .filter(col("step") === 1).select("lhs", "rhs")
      .as[(String, String)].head()
    assert(bpe1 != wp1, s"criteria collapsed: both chose $bpe1")
  }

  test("q105 encoding equals a reference encode under the trained merges") {
    import spark.implicits._
    val words = graft.sources.Tables(spark, sf, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .as[(String, Long)].collect().toMap
    val merges = reference(words, 10).map { case (_, a, b, _, _) => (a, b) }
    def encode(w: String): Int = {
      var syms = w.split("").filter(_.nonEmpty).toVector
      merges.foreach { case (a, b) =>
        val r = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            r += a + b; i += 2
          } else { r += syms(i); i += 1 }
        }
        syms = r.result()
      }
      syms.length
    }
    val docTotals = graft.sources.Tables(spark, sf, "documents")
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .as[(Long, String)].collect()
      .groupMapReduce(_._1) { case (_, w) => (1L, w.length.toLong, encode(w).toLong) } {
        case ((a1, b1, c1), (a2, b2, c2)) => (a1 + a2, b1 + b2, c1 + c2)
      }
    val got = graft.queries.DocQueries.q105BpeEncode(spark, sf)
      .select("doc_id", "n_words", "n_chars", "n_bpe_tokens")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == docTotals, "encoder diverged from the reference encode")
    // Sanity bounds: merges only shrink, never below one symbol per word.
    got.values.foreach { case (nw, nc, nb) =>
      assert(nb <= nc && nb >= nw, s"symbol counts out of bounds: $nw $nc $nb")
    }
  }

  test("zero merges encodes every character as its own symbol") {
    import spark.implicits._
    val docs = Seq((1L, "cat dog", "en", "s0", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.queries.DocQueries.bpeEncodeStats(docs, Nil)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, "en", 2L, 6L, 6L)), s"got $got")
  }

  test("wordpiece encoder: greedy longest-match-first, whole-word collapse, UNK") {
    import spark.implicits._
    // quick → the whole-word piece (longest wins over 'qu'+chars);
    // qui → qu + ##i (longest PREFIX match, not chars);
    // brown → five single chars; zebra → 'z' uncovered → [UNK] = 1 piece.
    val vocab = Seq("q", "u", "i", "c", "k", "b", "r", "o", "w", "n",
      "e", "a", "qu", "quick")
    val docs = Seq(
      (1L, "quick qui", "en", "s0", 9L),
      (2L, "brown zebra", "en", "s0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.queries.DocQueries.wordpieceEncodeStats(docs, vocab)
      .select("doc_id", "n_words", "n_pieces", "n_unk", "n_chars")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((2L, 3L, 0L, 8L)), s"doc 1: ${got(1L)}") // quick=1, qui=2
    assert(got(2L) == ((2L, 6L, 1L, 10L)), s"doc 2: ${got(2L)}") // brown=5, zebra=UNK
    // The driver-side twin renders the ## continuation convention and
    // must agree piece-for-piece with the relational fold's counts.
    assert(graft.queries.DocQueries.wordpieceSegment("quick", vocab)
      == Seq("quick"))
    assert(graft.queries.DocQueries.wordpieceSegment("qui", vocab)
      == Seq("qu", "##i"))
    assert(graft.queries.DocQueries.wordpieceSegment("brown", vocab)
      == Seq("b", "##r", "##o", "##w", "##n"))
    assert(graft.queries.DocQueries.wordpieceSegment("zebra", vocab)
      == Seq("[UNK]"))
  }

  test("wordpiece encoder on the fixture vocab agrees with the driver twin") {
    import spark.implicits._
    val docs = graft.sources.Tables(spark, sf, "documents")
    val vocab = graft.queries.DocQueries.wordpieceVocab(docs, 10)
    assert(vocab.exists(_.length > 1), "training produced no merged symbol")
    val words = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0 && length(col("w")) <= 16)
      .distinct().as[String].collect()
    val twin = words.map(w =>
      w -> graft.queries.DocQueries.wordpieceSegment(w, vocab)).toMap
    assert(twin.values.forall(_ != Seq("[UNK]")),
      "train-corpus words must all be coverable (chars are in the vocab)")
    val expected = docs
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0 && length(col("w")) <= 16)
      .as[(Long, String)].collect()
      .groupMapReduce(_._1) { case (_, w) => twin(w).length.toLong }(_ + _)
    val got = graft.queries.DocQueries.wordpieceEncodeStats(docs, vocab)
      .select("doc_id", "n_pieces").as[(Long, Long)].collect().toMap
    assert(got == expected, "fold diverged from the driver-side greedy twin")
  }

  test("trainer stops early when no pairs remain") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab", "en", "s0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.queries.DocQueries.bpeMerges(docs, 10)
      .as[(Long, String, String, String, Long)].collect().toSeq
    // One merge exhausts the corpus (every word becomes one symbol).
    assert(got == Seq((1L, "a", "b", "ab", 2L)), s"got $got")
  }

  private def mergeList(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    df.as[(Long, String, String, String, Long)].collect().toSeq.sortBy(_._1)
  }

  test("batched trainer equals the sequential trainer merge-for-merge (fixture, 50 rounds)") {
    val docs = graft.sources.Tables(spark, sf, "documents")
    val seqM = mergeList(graft.queries.DocQueries.bpeMerges(docs, 50))
    val batM = mergeList(graft.queries.DocQueries.bpeMergesBatched(docs, 50))
    assert(batM == seqM, s"diverged at ${
      batM.zip(seqM).indexWhere { case (a, b) => a != b }}:\n$batM\nvs\n$seqM")
    // At several batch caps too — the cap changes only the job count,
    // never the merge sequence.
    for (cap <- Seq(2, 7)) {
      val capped = mergeList(
        graft.queries.DocQueries.bpeMergesBatched(docs, 20, batchCap = cap))
      assert(capped == seqM.take(20), s"cap=$cap diverged")
    }
  }

  test("batched trainer survives the created-pair trap (rule 3: strict drop)") {
    import spark.implicits._
    // "xab" xN + "cd" x(N-1): ranked round-1 pairs (a,b)=N, (x,a)=N,
    // (c,d)=N-1. (x,a) overlaps (a,b) -> prefix stops at m=1, so the
    // batch never pairs (a,b) with (c,d) — which would be WRONG, because
    // sequentially the created (x,ab)=N outranks (c,d)=N-1.
    val docs = ((1 to 10).map(i => (i.toLong, "xab", "en", "s0", 3L)) ++
      (11 to 19).map(i => (i.toLong, "cd", "en", "s0", 2L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val seqM = mergeList(graft.queries.DocQueries.bpeMerges(docs, 4))
    val batM = mergeList(graft.queries.DocQueries.bpeMergesBatched(docs, 4))
    assert(batM == seqM, s"$batM\nvs\n$seqM")
    assert(seqM(1)._4 == "xab", "fixture lost its created-pair structure")
  }

  test("batched trainer survives the self-pair trap (rule 2)") {
    import spark.implicits._
    // "aaa" xN + "cd" xK, K < 2N: round-1 ranked (a,a)=2N, (c,d)=K.
    // Sequential: after (a,a), "aa a" mints (aa,a)=N which outranks
    // (c,d) when N > K — a batch {(a,a),(c,d)} would reorder history.
    val docs = ((1 to 8).map(i => (i.toLong, "aaa", "en", "s0", 3L)) ++
      (9 to 14).map(i => (i.toLong, "cd", "en", "s0", 2L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val seqM = mergeList(graft.queries.DocQueries.bpeMerges(docs, 4))
    val batM = mergeList(graft.queries.DocQueries.bpeMergesBatched(docs, 4))
    assert(batM == seqM, s"$batM\nvs\n$seqM")
    assert(seqM(1)._2 == "aa" && seqM(1)._3 == "a",
      "fixture lost its self-pair structure")
  }

  test("batched trainer survives the tie-at-boundary trap (rule 3)") {
    import spark.implicits._
    // Pairs (a,b) and (c,d) tie at N; created pairs from (a,b) could
    // tie-break ahead lexicographically if the batch crossed the tie.
    val docs = ((1 to 6).map(i => (i.toLong, "ab", "en", "s0", 2L)) ++
      (7 to 12).map(i => (i.toLong, "cd", "en", "s0", 2L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val seqM = mergeList(graft.queries.DocQueries.bpeMerges(docs, 3))
    val batM = mergeList(graft.queries.DocQueries.bpeMergesBatched(docs, 3))
    assert(batM == seqM, s"$batM\nvs\n$seqM")
  }
}
