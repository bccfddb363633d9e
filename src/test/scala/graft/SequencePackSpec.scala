package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocQueries

/** q143 harmonic sequence packing: the scaladoc's structural guarantees,
  * pinned. Zero overflow (no window's token sum exceeds the cap),
  * windows-per-class exactly ceil(n_k/k) with dense ids, longest-first
  * fill (windows are length-monotone, so at most one partial window per
  * class holds the shortest items), the over-cap tiling rule (an over-cap
  * document re-enters as its remainder only, vanishing when the remainder
  * is zero), the full-window padding bound (> k·cap/(k+1) tokens), and
  * bit-identical assignment under repartitioning — no packing decision
  * may depend on row arrival order. */
class SequencePackSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cap = 16L

  /** Lengths chosen to hit every interesting class of cap=16:
    * k=1 (len 9..16), k=2 (len 6..8), k=3 (5), k=4 (4), k=16 (1);
    * plus over-cap docs: 35 → remainder 3 (k=5), 32 → remainder 0
    * (vanishes), 17 → remainder 1 (k=16). */
  private val lengths = Map(
    1L -> 16, 2L -> 16, 3L -> 12, 4L -> 9, 5L -> 10,     // k=1 ×5
    6L -> 8, 7L -> 7, 8L -> 6,                            // k=2 ×3
    9L -> 5, 10L -> 5, 11L -> 5, 12L -> 5,                // k=3 ×4
    13L -> 4,                                             // k=4 ×1
    14L -> 1, 15L -> 1,                                   // k=16 ×2
    16L -> 35,                                            // rem 3, k=5
    17L -> 32,                                            // rem 0: gone
    18L -> 17)                                            // rem 1, k=16

  private def tok: DataFrame =
    lengths.toSeq.map { case (id, n) => (id, Seq.fill(n)("t")) }
      .toDF("doc_id", "toks")

  private def packed: Array[(Long, Long, Long, Long)] =
    DocQueries.packSequences(tok, cap)
      .select("doc_id", "len", "k", "window_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))

  test("zero overflow: every window's token sum is at most the cap") {
    val sums = packed.groupBy(p => (p._3, p._4)).view
      .mapValues(_.map(_._2).sum)
    assert(sums.values.forall(_ <= cap),
      s"overflowing windows: ${sums.filter(_._2 > cap)}")
  }

  test("over-cap docs re-enter as remainders; zero-remainder docs vanish") {
    val byDoc = packed.map(p => p._1 -> p._2).toMap
    assert(byDoc(16L) == 3L && byDoc(18L) == 1L)
    assert(!byDoc.contains(17L), "32 = 2 full windows exactly, no remainder")
    assert(byDoc(1L) == 16L, "an exactly-cap doc packs whole (k=1)")
  }

  test("per class: ceil(n_k/k) windows, dense ids, at most one partial") {
    val byClass = packed.groupBy(_._3)
    for ((k, members) <- byClass) {
      val nk = members.length.toLong
      val wids = members.map(_._4)
      val expected = (nk + k - 1) / k
      assert(wids.distinct.sorted.toList == (0L until expected).toList,
        s"class $k: want dense ids 0..${expected - 1}, got ${wids.toList}")
      val sizes = wids.groupBy(identity).view.mapValues(_.length).toMap
      assert(sizes.count(_._2 < k) <= 1,
        s"class $k has more than one partial window")
      sizes.filter(_._2 < k).keys.foreach(w =>
        assert(w == expected - 1, s"class $k: partial window not last"))
    }
  }

  test("longest-first fill: window lengths are monotone within a class") {
    for ((_, members) <- packed.groupBy(_._3)) {
      val byWin = members.groupBy(_._4).view
        .mapValues(_.map(_._2)).toMap
      for (w <- byWin.keys if byWin.contains(w + 1))
        assert(byWin(w).min >= byWin(w + 1).max,
          s"window $w holds shorter items than window ${w + 1}")
    }
  }

  test("full windows carry more than k·cap/(k+1) tokens (padding bound)") {
    for ((k, members) <- packed.groupBy(_._3)) {
      val byWin = members.groupBy(_._4)
      for ((w, items) <- byWin if items.length == k)
        assert(items.map(_._2).sum * (k + 1) > k * cap,
          s"class $k window $w violates the harmonic padding bound")
    }
  }

  test("assignment is bit-identical under every partitioning") {
    val ref = packed.sortBy(_._1).toList
    for (p <- Seq(1, 3, 16)) {
      val got = DocQueries.packSequences(tok.repartition(p), cap)
        .select("doc_id", "len", "k", "window_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1).toList
      assert(got == ref, s"diverged at repartition($p)")
    }
  }
}
