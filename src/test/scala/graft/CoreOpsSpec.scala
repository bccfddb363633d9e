package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.core

/** Unit coverage for the scalar/structural ops layer (SURVEY §5.3).
  * Each case pins the reference behavior it mirrors (file:line under
  * /root/reference/).
  */
class CoreOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def eval1[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).collect().head.getAs[T]("v")

  // --- HHMM formatter (flights_lookup_to_kafka.py:15-16) ---

  test("hhmmToStr formats midnight, leading zeros, and 2359") {
    val rows = Seq(0, 5, 100, 905, 1305, 2359).toDF("t")
      .select(core.hhmmToStr($"t").as("s")).as[String].collect()
    assert(rows.toSeq == Seq("00:00", "00:05", "01:00", "09:05", "13:05", "23:59"))
  }

  // --- Callsign → airline code (AirlineAircraftCountStream.java:74-85) ---

  test("callsignAirline: blank→UNKNOWN, N→PRIVATE, short passthrough, else 3-prefix") {
    val rows = Seq("", "  ", "N123AB", "AA", "DLH441", "ual12", null)
      .toDF("cs").select(core.callsignAirline($"cs").as("a")).as[String].collect()
    assert(rows.toSeq == Seq("UNKNOWN", "UNKNOWN", "PRIVATE", "AA", "DLH", "UAL", "UNKNOWN"))
  }

  // --- Haversine (AirportAircraftCountStream.java:79-88) ---

  test("haversine is zero at identity and symmetric") {
    val d0 = eval1[Double](core.haversineKm(lit(45.0), lit(20.0), lit(45.0), lit(20.0)))
    assert(d0 == 0.0)
    val ab = eval1[Double](core.haversineKm(lit(44.82), lit(20.29), lit(48.21), lit(16.37)))
    val ba = eval1[Double](core.haversineKm(lit(48.21), lit(16.37), lit(44.82), lit(20.29)))
    assert(math.abs(ab - ba) < 1e-9)
  }

  test("haversine matches a known city pair within 1%") {
    // Belgrade (44.82, 20.29) ↔ Vienna (48.21, 16.37) ≈ 482 km great-circle.
    val d = eval1[Double](core.haversineKm(lit(44.82), lit(20.29), lit(48.21), lit(16.37)))
    assert(d > 477 && d < 487, s"got $d")
  }

  // --- Bucketize (batch_process.py:160-170) ---

  test("bucketize: edges land in the lower-inclusive bucket, last is open-ended") {
    val (id, label) = core.bucketize($"x", Seq(0.0, 250.0, 500.0))
    val rows = Seq(0.0, 249.9, 250.0, 499.9, 500.0, 10000.0, -1.0)
      .toDF("x").select(id.as("id"), label.as("label")).collect()
    assert(rows.map(r => Option(r.get(0)).map(_.toString).orNull).toSeq ==
      Seq("0", "0", "1", "1", "2", "2", null))
    assert(rows.map(_.getAs[String]("label")).toSeq ==
      Seq("0-250", "0-250", "250-500", "250-500", "500+", "500+", null))
  }

  // --- Conditional count + percent guards (batch_process.py:19,106-109) ---

  test("countIf counts only matches; pctOf guards division by zero") {
    val df = Seq(1, 5, 10, 20).toDF("x")
    val r = df.agg(
      core.countIf($"x" > 5).as("n"),
      core.pctOf(core.countIf($"x" > 5), count(lit(1))).as("pct"),
      core.pctOf(lit(1), lit(0)).as("div0")).collect().head
    assert(r.getAs[Long]("n") == 2)
    assert(r.getAs[Double]("pct") == 50.0)
    assert(r.isNullAt(r.fieldIndex("div0")))
  }

  // --- Unpivot (batch_process.py:126-135) ---

  test("unpivot produces one row per (input row, pair) with id columns kept") {
    val df = Seq((1, 10.0, 20.0), (2, 30.0, 40.0)).toDF("id", "a", "b")
    val out = core.unpivot(df, Seq("A" -> "a", "B" -> "b"), "k", "v", idCols = Seq("id"))
    assert(out.columns.toSeq == Seq("id", "k", "v"))
    assert(out.count() == 4)
    assert(out.filter($"id" === 1 && $"k" === "B").select($"v").as[Double].head() == 20.0)
  }

  // --- Mode per key (flights_lookup_to_kafka.py:30-46) ---

  test("modeByKey picks most frequent value, smaller value on tie") {
    val df = Seq(("k1", "x"), ("k1", "x"), ("k1", "y"),
                 ("k2", "b"), ("k2", "a")).toDF("k", "v")
    val out = core.modeByKey(df, "k", "v").orderBy("k").as[(String, String)].collect()
    assert(out.toSeq == Seq(("k1", "x"), ("k2", "a")))
  }

  // --- As-of join (q58; union-and-sweep, ops/core.scala) ---

  test("asofJoin: latest right <= left wins, equal timestamps match, no prior right pads null") {
    val clicks = Seq((1L, "u1", 100L), (2L, "u1", 250L), (3L, "u2", 50L))
      .toDF("click_id", "user", "t")
    val views = Seq(("u1", 100L, "v@100"), ("u1", 200L, "v@200"), ("u2", 60L, "v@60"))
      .toDF("user", "vt", "tag")
    val out = core.asofJoin(clicks, views, Seq("user"), "t", "vt")
      .orderBy("click_id").select("click_id", "tag").collect()
    // click 1 at t=100 matches the view AT 100 (DuckDB `l.t >= r.t`);
    // click 2 at 250 takes the latest earlier view (200, not 100);
    // click 3 at 50 precedes u2's only view → left-outer null padding.
    assert(out.map(r => (r.getLong(0), Option(r.getString(1)).orNull)).toSeq ==
      Seq((1L, "v@100"), (2L, "v@200"), (3L, null)))
  }

  test("asofJoin: null-time right rows never match; null-time left rows pad null") {
    val clicks = Seq((1L, "u1", Option(100L)), (2L, "u1", Option.empty[Long]))
      .toDF("click_id", "user", "t")
    val views = Seq(("u1", Option(10L), "ok"), ("u1", Option.empty[Long], "poison"))
      .toDF("user", "vt", "tag")
    val out = core.asofJoin(clicks, views, Seq("user"), "t", "vt")
      .orderBy("click_id").collect()
    // Regression for the nulls-sort-first divergence: without the in-op
    // filter, the null-time click would pick up the null-time "poison" view
    // (both sort first under asc ordering) — DuckDB ASOF yields no match.
    assert(out(0).getAs[String]("tag") == "ok")
    assert(out(1).isNullAt(out(1).fieldIndex("tag")))
    assert(out(1).isNullAt(out(1).fieldIndex("vt")))
  }

  test("asofJoin: agrees with a brute-force reference across partitionings") {
    val rnd = new scala.util.Random(42)
    val lefts = (1 to 200).map(i =>
      (i.toLong, s"u${rnd.nextInt(10)}", rnd.nextInt(1000).toLong))
    val rights = (1 to 150).map(_ => (s"u${rnd.nextInt(12)}", rnd.nextInt(1000).toLong))
      .distinct // contract: unique per (key, rightTime)
      .map { case (u, t) => (u, t, s"$u@$t") }
    val expected = lefts.map { case (id, u, t) =>
      id -> rights.filter(r => r._1 == u && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3).orNull
    }.toMap
    val out = core.asofJoin(
      lefts.toDF("click_id", "user", "t").repartition(7),
      rights.toDF("user", "vt", "tag").repartition(5),
      Seq("user"), "t", "vt")
      .select("click_id", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).orNull).toMap
    assert(out == expected)
    // the skew-salted variant must agree on the same data at several
    // bucket widths (1 = everything in one bucket per ~1000-wide range;
    // 100 = carries cross buckets constantly; 7 = misaligned boundaries)
    for (width <- Seq(1000L, 100L, 7L)) {
      val salted = core.asofJoinSalted(
        lefts.toDF("click_id", "user", "t").repartition(7),
        rights.toDF("user", "vt", "tag").repartition(5),
        Seq("user"), "t", "vt", t => floor(t / width.toDouble))
        .select("click_id", "tag").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1)).orNull).toMap
      assert(salted == expected, s"bucket width $width diverged")
    }
  }

  test("asofJoinSalted: null-time semantics match the unsalted op") {
    val clicks = Seq((1L, "u1", Option(100L)), (2L, "u1", Option.empty[Long]))
      .toDF("click_id", "user", "t")
    val views = Seq(("u1", Option(10L), "ok"), ("u1", Option.empty[Long], "poison"))
      .toDF("user", "vt", "tag")
    val out = core.asofJoinSalted(clicks, views, Seq("user"), "t", "vt",
      t => floor(t / 50.0)).orderBy("click_id").collect()
    assert(out(0).getAs[String]("tag") == "ok")
    assert(out(1).isNullAt(out(1).fieldIndex("tag")))
  }

  // --- OTP / min-max normalize (batch_process.py:22-25,71-75) ---

  test("otpPercent and minMaxScore constant-range guard") {
    val r = spark.range(1).select(
      core.otpPercent(lit(25), lit(100)).as("otp"),
      core.minMaxScore(lit(5.0), lit(0.0), lit(10.0)).as("mm"),
      core.minMaxScore(lit(5.0), lit(5.0), lit(5.0)).as("const")).collect().head
    assert(r.getAs[Double]("otp") == 75.0)
    assert(r.getAs[Double]("mm") == 50.0)
    assert(r.getAs[Double]("const") == 100.0)
  }
}
