package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.ops.core

/** Property-based coverage (SURVEY §5.4), raw ScalaCheck (the
  * scalatest/scalacheck bridge artifact is not in the offline cache; sbt
  * runs ScalaCheck Properties natively). Properties evaluate through Spark's
  * own expression pipeline (collected from tiny DataFrames) so they exercise
  * the real codegen path, not a Scala re-implementation.
  */
object CorePropsSpec extends Properties("graft.ops.core") {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Spark round-trips are ~50ms each; 20 cases per property keeps the suite fast.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private def evalD(c: org.apache.spark.sql.Column): Double =
    spark.range(1).select(c.as("v")).as[Double].head()

  property("otpPercent in [0,100] when 0<=delayed<=total") = forAll(
    Gen.choose(1L, 1000L).flatMap(t => Gen.choose(0L, t).map(d => (d, t)))) {
    case (delayed, total) =>
      val otp = evalD(core.otpPercent(lit(delayed), lit(total)))
      otp >= 0.0 && otp <= 100.0
  }

  property("minMaxScore in [0,scale] for v in [mn,mx]") = forAll(
    for {
      mn <- Gen.choose(-100.0, 100.0)
      w <- Gen.choose(0.0, 50.0)
      f <- Gen.choose(0.0, 1.0)
    } yield (mn, mn + w, mn + w * f)) { case (mn, mx, v) =>
    val s = evalD(core.minMaxScore(lit(v), lit(mn), lit(mx)))
    s >= -1e-9 && s <= 100.0 + 1e-9
  }

  property("unpivot multiplies rows by pair count") =
    forAll(Gen.choose(0, 20), Gen.choose(1, 5)) { (rows, nPairs) =>
      val cols = (1 to nPairs).map(i => s"c$i")
      val base = spark.range(rows.toLong).toDF("id")
      val wide = cols.foldLeft(base)((d, c) => d.withColumn(c, col("id") * 2))
      val out = core.unpivot(wide, cols.map(c => c -> c), "k", "v", Seq("id"))
      out.count() == rows.toLong * nPairs
    }

  property("bucketize keeps in-range rows, ids in [0,nBuckets]; below-range → null") = {
    val splitsGen = Gen.choose(2, 6)
      .flatMap(n => Gen.listOfN(n, Gen.choose(0.0, 1000.0)).map(_.distinct.sorted))
      .suchThat(_.size >= 2)
    forAll(splitsGen, Gen.listOfN(30, Gen.choose(-100.0, 1200.0))) { (splits, xs) =>
      val (id, _) = core.bucketize(col("x"), splits)
      xs.toDF("x").select(col("x"), id.as("id")).collect().forall { r =>
        val x = r.getDouble(0)
        if (x >= splits.head) !r.isNullAt(1) && r.getLong(1) >= 0 &&
          r.getLong(1) <= splits.size - 1
        else r.isNullAt(1)
      }
    }
  }

  property("hhmmToStr formats any (h,m) with leading zeros") =
    forAll(Gen.choose(0, 23), Gen.choose(0, 59)) { (h, m) =>
      spark.range(1).select(core.hhmmToStr(lit(h * 100 + m)).as("v"))
        .as[String].head() == f"$h%02d:$m%02d"
    }

  property("asofJoinSalted == asofJoin for any data and bucket width") = forAll(
    for {
      n <- Gen.choose(1, 50)
      m <- Gen.choose(0, 40)
      width <- Gen.choose(1L, 200L)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (n, m, width, seed)) { case (n, m, width, seed) =>
    val rnd = new scala.util.Random(seed)
    val lefts = (1 to n).map(i =>
      (i.toLong, s"u${rnd.nextInt(5)}", rnd.nextInt(500).toLong))
    val rights = (1 to m).map(_ => (s"u${rnd.nextInt(6)}", rnd.nextInt(500).toLong))
      .distinct.map { case (u, t) => (u, t, s"$u@$t") }
    val l = lefts.toDF("id", "k", "t")
    val r = rights.toDF("k", "vt", "tag")
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      df.select("id", "tag").collect()
        .map(x => x.getLong(0) -> Option(x.getString(1)).orNull).toMap
    val plain = run(core.asofJoin(l, r, Seq("k"), "t", "vt"))
    val salted = run(core.asofJoinSalted(l, r, Seq("k"), "t", "vt",
      t => floor(t / width.toDouble)))
    Prop(plain == salted) :| s"width=$width plain=$plain salted=$salted"
  }

  property("modeByKey emits exactly one row per distinct key") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 4), Gen.choose(0, 3)))) { pairs =>
      val df = pairs.map { case (k, v) => (s"k$k", s"v$v") }.toDF("k", "v")
      val keys = core.modeByKey(df, "k", "v").select("k").as[String].collect()
      Prop(keys.length == keys.distinct.length &&
        keys.length == pairs.map(_._1).distinct.length)
    }
}
