package graft

import scala.util.Random

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.functions.MisraGriesCandidates

/** The guarantee-bearing spec for [[graft.functions.MisraGriesCandidates]]
  * (cited from q57's scaladoc): the sf fixtures' bigram vocabulary is
  * smaller than q57's k=1024, so neither the decrement-all eviction branch
  * (update with a full buffer) nor the subtract-(k+1)-th merge compaction
  * ever fires in the oracle run. Here both are forced deliberately:
  *
  *   - adversarial skewed streams with distinct keys >> k (eviction fires
  *     on every tail key once the buffer fills);
  *   - random chunking into partial buffers, each pushed through the
  *     serialize/deserialize wire step TypedImperativeAggregate uses
  *     between partial and final aggregation, merged in random order
  *     (disjoint-key partials force size > k, so compaction fires);
  *
  * and the Misra–Gries contract is property-checked against exact counts:
  * after ANY chunking and merge order, every key with true frequency
  * > n/(k+1) is in the output, and the output never exceeds k entries.
  * A final end-to-end case runs the same adversarial data through Spark's
  * real partial-aggregation pipeline (2 controlled partitions) and checks
  * q57's full two-pass plan (sketch -> broadcast candidates -> exact count)
  * against a direct groupBy-count of the same data.
  */
object FreqSketchSpec extends Properties("graft.functions.FreqSketch") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  /** Drive the aggregate exactly as Spark's agg pipeline would: one buffer
    * per chunk (= map task), a serialize/deserialize round-trip per partial
    * (the wire step between partial and final stages), then merges in the
    * caller's order. */
  private def sketch(chunks: Seq[Seq[String]], k: Int): Set[String] = {
    val agg = MisraGriesCandidates(
      BoundReference(0, StringType, nullable = true), Literal(k))
    val partials = chunks.map { c =>
      val buf = agg.createAggregationBuffer()
      c.foreach(s => agg.update(buf, InternalRow(UTF8String.fromString(s))))
      agg.deserialize(agg.serialize(buf))
    }
    val merged = partials.foldLeft(agg.createAggregationBuffer())(agg.merge)
    agg.eval(merged).asInstanceOf[GenericArrayData]
      .array.map(_.asInstanceOf[UTF8String].toString).toSet
  }

  private def heavyKeys(stream: Seq[String], k: Int): Set[String] = {
    val n = stream.size.toDouble
    stream.groupBy(identity).collect {
      case (key, occ) if occ.size > n / (k + 1) => key
    }.toSet
  }

  /** Skewed stream: a few heavy keys each repeated `tailN` times over a
    * tail of `tailN` distinct singletons (tailN >> k forces eviction), plus
    * a deterministic shuffle and random chunk/merge order. */
  private val adversarialGen: Gen[(Int, Seq[Seq[String]], Seq[String])] = for {
    k <- Gen.choose(3, 12)
    nHeavy <- Gen.choose(1, math.min(3, k - 1))
    tailN <- Gen.choose(40, 300) // distinct tail keys >> k
    nChunks <- Gen.choose(1, 8)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val heavy = (1 to nHeavy).flatMap(i => Seq.fill(tailN)(s"H$i"))
    val tail = (1 to tailN).map(i => s"t$i")
    val rnd = new Random(seed)
    val stream = rnd.shuffle((heavy ++ tail).toVector)
    val size = math.max(1, math.ceil(stream.size.toDouble / nChunks).toInt)
    val chunks = rnd.shuffle(stream.grouped(size).map(_.toSeq).toVector)
    (k, chunks, stream)
  }

  property("superset of n/(k+1) heavy hitters under skew + random merges") =
    forAll(adversarialGen) { case (k, chunks, stream) =>
      val out = sketch(chunks, k)
      val heavy = heavyKeys(stream, k)
      Prop(heavy.subsetOf(out)) :| s"missing: ${heavy.diff(out)}" &&
        Prop(out.size <= k) :| s"size ${out.size} > k=$k"
    }

  property("exact (no eviction, no compaction) when distinct keys <= k") =
    forAll(Gen.choose(1, 10), Gen.choose(1, 6), Gen.choose(0L, Long.MaxValue)) {
      (distinct, nChunks, seed) =>
        val rnd = new Random(seed)
        val stream = rnd.shuffle(
          (1 to distinct).flatMap(i => Seq.fill(1 + i % 3)(s"k$i")).toVector)
        val size = math.max(1, math.ceil(stream.size.toDouble / nChunks).toInt)
        val chunks = stream.grouped(size).map(_.toSeq).toVector
        sketch(chunks, k = 10) == stream.toSet
    }

  // Deterministic structural case: two FULL partials with disjoint keys,
  // so the merged buffer necessarily exceeds k and the subtract-(k+1)-th
  // compaction MUST run; the genuinely heavy key (present in both chunks,
  // freq 40/104 > 104/9) must survive it.
  property("merge compaction on disjoint full partials keeps the heavy key") = {
    val k = 8
    val c1 = (1 to k).flatMap(i => Seq.fill(3)(s"a$i")) ++ Seq.fill(20)("HH")
    val c2 = (1 to k).flatMap(i => Seq.fill(2)(s"b$i")) ++ Seq.fill(20)("HH")
    val out = sketch(Seq(c1, c2), k)
    val out2 = sketch(Seq(c2, c1), k) // merge order must not break it
    Prop(out.contains("HH") && out2.contains("HH") &&
      out.size <= k && out2.size <= k)
  }

  // End-to-end through Spark's real ObjectHashAggregate partial/final
  // pipeline: 2 controlled partitions with disjoint vocabularies (parallelize
  // preserves slice boundaries), vocabulary 2x400 >> k=8 so per-task eviction
  // fires, and the final merge sees disjoint full buffers so compaction
  // fires. Then q57's whole two-pass plan (sketch -> broadcast candidate
  // join -> exact count -> threshold) must equal the direct groupBy-count
  // heavy-hitter answer on the same data.
  property("Spark e2e: q57 two-pass plan == direct groupBy on adversarial data") = {
    graft.functions.FreqSketch.register(spark)
    import spark.implicits._
    val part1 = (1 to 400).map(i => s"x$i") ++ Seq.fill(300)("HOT1") ++ Seq.fill(200)("HOT2")
    val part2 = (1 to 400).map(i => s"y$i") ++ Seq.fill(300)("HOT1") ++ Seq.fill(150)("HOT3")
    val df = spark.createDataset(
      spark.sparkContext.parallelize(Seq(part1, part2), 2).flatMap(identity))
      .toDF("tok")
    df.persist()
    try {
      val n = df.count() // 1750; threshold n/(k+1) with k=8 -> 194.4
      val cands = df.agg(expr("graft_mg_candidates(tok, 8)").as("cands"))
        .select(explode(col("cands")).as("tok"))
        .as[String].collect().toSet
      val exactHeavy = df.groupBy("tok").count()
        .filter(col("count") > n / 9.0)
        .as[(String, Long)].collect().toMap
      // Sketch candidates: superset of the true heavy hitters, <= k of them.
      val superset = exactHeavy.keySet.subsetOf(cands) && cands.size <= 8
      // Pass 2 of the q57 plan: exact counts over candidates only, then the
      // true threshold — false positives must die here.
      val candDf = cands.toSeq.toDF("tok")
      val twoPass = df.join(broadcast(candDf), Seq("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > n / 9.0)
        .as[(String, Long)].collect().toMap
      Prop(superset) :| s"cands=$cands missing=${exactHeavy.keySet.diff(cands)}" &&
        Prop(twoPass == exactHeavy) :| s"twoPass=$twoPass exact=$exactHeavy"
    } finally df.unpersist()
  }
}
