package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.streaming.EventStreams

/** Property: the upsert sink's last-window-wins reduction is associative —
  * folding any random slicing of the emitted windows through upsertMerge
  * equals merging everything at once, so the K6 sink's result cannot
  * depend on how the stream was micro-batched. (Append mode emits each
  * (key, window) at most once, which the generator mirrors.)
  */
object UpsertMergePropsSpec extends Properties("EventStreams.upsertMerge") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val rowsGen: Gen[List[(String, String, Long)]] = for {
    n <- Gen.choose(0, 12)
    rows <- Gen.listOfN(n, for {
      k <- Gen.oneOf("a", "b", "c", "d")
      m <- Gen.choose(0, 5)
      c <- Gen.choose(1L, 9L)
    } yield (k, f"2024-01-01 10:0$m%d:00", c))
  } yield rows.groupBy(r => (r._1, r._2)).values.map(_.head).toList // unique (key, win)

  private val caseGen: Gen[(List[(String, String, Long)], List[Int])] = for {
    rows <- rowsGen
    nCuts <- Gen.choose(0, 3)
    cuts <- Gen.listOfN(nCuts, Gen.choose(0, math.max(rows.size, 1)))
  } yield (rows, cuts.sorted)

  property("merge(fold(slices)) == merge(all) for any slicing") = forAll(caseGen) {
    case (rows, cuts) =>
      import spark.implicits._
      def df(rs: Seq[(String, String, Long)]) =
        rs.toDF("event_type", "win_start", "distinct_users")
      val empty = df(rows).limit(0)
      def collect(d: org.apache.spark.sql.DataFrame) =
        d.as[(String, String, Long)].collect().toSet
      val oneShot = collect(EventStreams.upsertMerge(empty, df(rows), "event_type"))
      val slices = (0 +: cuts :+ rows.size).sliding(2)
        .map { case Seq(a, b) => rows.slice(a, b) }.toList
      val folded = slices.foldLeft(empty) { (acc, s) =>
        EventStreams.upsertMerge(acc, df(s), "event_type") }
      collect(folded) == oneShot
  }
}
