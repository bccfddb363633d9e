package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q18 is the documented 100 TB escape hatch for exact distinct-count
  * state, and its oracle row is rows-only (HLL sketches are
  * engine-specific) — so its ERROR was documented (±5% at the default
  * rsd) but never measured. This pins it: HLL is deterministic for a
  * given input, so the measured error on the shipped testdata is a
  * stable floor, and a silent precision regression (rsd drift, sketch
  * misuse, wrong column) fails here before any user sees a bad count. */
class ApproxDistinctSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  // sf0.1: the smaller factors' per-(hour, type) cardinalities sit in
  // HLL's sparse range, where the sketch is exact and the test vacuous.
  private val sf = "/root/testdata/sf0.1"

  test("q18 approx distinct stays within the documented rsd of exact") {
    import spark.implicits._
    val approx = graft.queries.EventQueries.q18WindowedApproxDistinct(spark, sf)
      .as[(String, String, Long)].collect()
      .map { case (w, k, n) => (w, k) -> n }.toMap
    val exact = graft.sources.Tables(spark, sf, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("exact_users"))
      .as[(String, String, Long)].collect()
      .map { case (w, k, n) => (w, k) -> n }.toMap
    assert(approx.keySet == exact.keySet,
      "approx path must produce exactly the exact path's groups")
    def errs(floor: Long) = exact.collect { case (k, e) if e >= floor =>
      math.abs(approx(k).toDouble - e) / e }
    val broad = errs(20)
    val big = errs(50)
    assert(broad.nonEmpty && big.nonEmpty)
    val mean = broad.sum / broad.size
    info(f"HLL rel error: mean=$mean%.4f over ${broad.size} groups (exact>=20); " +
      f"worst=${broad.max}%.4f (>=20), ${big.max}%.4f (>=50)")
    // rsd = 0.05 default. Measured at sf0.1: mean 0.0254, worst 0.167 on
    // >=20 (a 24-exact group, where one-count quantization is ~4%/step)
    // and within 3 sigma on >=50 — the documented +-5% story holds where
    // counts are big enough for "relative" to mean anything.
    assert(mean <= 0.05, f"mean HLL error $mean%.4f exceeds the documented rsd")
    assert(big.max <= 0.15, f"worst HLL error ${big.max}%.4f (exact>=50) exceeds 3x rsd")
    assert(broad.max <= 0.25, f"worst HLL error ${broad.max}%.4f (exact>=20) out of band")
  }
}
