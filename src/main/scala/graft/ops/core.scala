package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core column-level building blocks of the engine.
  *
  * Everything here is a pure `Column => Column` / `DataFrame => DataFrame`
  * function built from `org.apache.spark.sql.functions` so the whole surface
  * stays inside whole-stage codegen (no UDFs). Each op cites the reference
  * behavior it reproduces (paths relative to /root/reference/).
  */
object core {

  /** Conditional count — the reference's recurring `F.count(F.when(cond, 1))`
    * idiom (orchestration/src/batch_process.py:19,104,147,196). */
  def countIf(cond: Column): Column = count(when(cond, 1))

  /** Share as percent with divide-by-zero guard
    * (batch_process.py:106-109,148-151). Returns null when total is 0,
    * matching the reference's `otherwise(None)`. */
  def pctOf(n: Column, total: Column): Column =
    when(total > 0, n.cast("double") / total * 100.0).otherwise(lit(null))

  /** On-time-performance percent: `(1 - delayed/total) * 100`
    * (batch_process.py:22-25). */
  def otpPercent(delayed: Column, total: Column): Column =
    (lit(1.0) - delayed.cast("double") / total) * 100.0

  /** Min-max normalization with constant-range guard: 100 when max == min
    * (batch_process.py:71-75); generic 0..scale. */
  def minMaxScore(c: Column, mn: Column, mx: Column, scale: Double = 100.0): Column =
    when(mx === mn, lit(scale))
      .otherwise((c - mn).cast("double") / (mx - mn) * scale)

  /** HHMM int (e.g. 1305) → "13:05" (flights_lookup_to_kafka.py:15-16). */
  def hhmmToStr(c: Column): Column =
    format_string("%02d:%02d", floor(c / 100).cast("int"), (c % 100).cast("int"))

  /** Haversine great-circle distance in km, pure column expression (stays in
    * codegen; no UDF). Same formula as the reference's only domain-specific
    * scalar (stream-processing/.../AirportAircraftCountStream.java:79-88). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val r = 6371.0
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * r) * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }

  /** Callsign → airline-code prefix rule
    * (AirlineAircraftCountStream.java: extractAirlineCode): blank → UNKNOWN,
    * leading 'N' → PRIVATE, length < 3 → as-is, else first 3 chars.
    * Operates on the trimmed upper-cased callsign like the reference. */
  def callsignAirline(callsign: Column): Column = {
    val cs = upper(trim(coalesce(callsign, lit(""))))
    when(length(cs) === 0, "UNKNOWN")
      .when(substring(cs, 1, 1) === "N", "PRIVATE")
      .when(length(cs) < 3, cs)
      .otherwise(substring(cs, 1, 3))
  }

  /** Bucketize a numeric column against ascending finite splits: bucket i is
    * [splits(i), splits(i+1)) and the last bucket is [splits.last, +inf) —
    * the reference's `[0,250,…,2500,inf]` shape. Returns (bucketId, label)
    * columns. Replaces the reference's MLlib `Bucketizer` + coalesce(when...)
    * labeling (batch_process.py:160-170) with a codegen-friendly when-chain. */
  def bucketize(c: Column, splits: Seq[Double]): (Column, Column) = {
    require(splits.sizeIs >= 2, "need at least 2 split points")
    val bounded = splits.sliding(2).toSeq
    val labels = bounded.map {
      case Seq(lo, hi) => s"${lo.toLong}-${hi.toLong}"
    } :+ s"${splits.last.toLong}+"
    val inner = bounded.zipWithIndex.foldLeft(null: Column) {
      case (acc, (Seq(lo, hi), i)) =>
        if (acc == null) when(c >= lo && c < hi, i)
        else acc.when(c >= lo && c < hi, i)
    }
    val id = inner.when(c >= splits.last, bounded.size).cast("long")
    val label = labels.zipWithIndex.foldLeft(lit(null): Column) {
      case (acc, (lbl, i)) => coalesce(acc, when(id === i, lbl))
    }
    (id, label)
  }

  /** Unpivot `(label, valueCol)*` pairs into (keyName, valueName) rows via
    * `stack` — the reference's delay-reasons / diverted-airports shape
    * (batch_process.py:126-135,216-228). Values must share one type. */
  def unpivot(df: DataFrame, pairs: Seq[(String, String)],
              keyName: String, valueName: String,
              idCols: Seq[String] = Nil): DataFrame = {
    val stackArgs = pairs.map { case (lbl, c) => s"'$lbl', `$c`" }.mkString(", ")
    val stackExpr =
      s"stack(${pairs.size}, $stackArgs) as (`$keyName`, `$valueName`)"
    df.selectExpr(idCols.map(c => s"`$c`") :+ stackExpr: _*)
  }

  /** Scale-safe geo range join: bounding-box grid equi-bucketing + exact
    * haversine refine — the query-rewrite alternative to a broadcast
    * nested-loop cross join with a radius predicate (SURVEY §4
    * "nested-loop geo match"; reference does the naive scan at
    * AirportAircraftCountStream.java:224-235).
    *
    * Each left row lands in exactly one (latCell, lonCell); each right row
    * is exploded to its own cell plus the 8 neighbors (longitude wraps mod
    * 360/cellLonDeg so antimeridian pairs still meet), turning the radius
    * predicate into an equi-join a hash join can execute. At 100 TB the big
    * side is probed once per row on a 2-int key instead of evaluating the
    * haversine against every dim row.
    *
    * Soundness condition (caller's responsibility): cellLatDeg ≥
    * radiusKm/111.195 and cellLonDeg ≥ radiusKm/(111.195·cos(maxAbsLat))
    * for the highest |latitude| in the data, and 360 must divide evenly by
    * cellLonDeg. The per-pair refine keeps false positives out; cells only
    * have to never *miss* a pair. */
  def geoGridJoin(left: DataFrame, right: DataFrame,
                  lLat: Column, lLon: Column, rLat: Column, rLon: Column,
                  radiusKm: Double, cellLatDeg: Double, cellLonDeg: Double,
                  broadcastRight: Boolean = true): DataFrame = {
    require(math.abs(360.0 / cellLonDeg - math.round(360.0 / cellLonDeg)) < 1e-9,
      "cellLonDeg must divide 360 so longitude cells wrap cleanly")
    val nLon = math.round(360.0 / cellLonDeg).toInt
    val l = left
      .withColumn("_cell_lat", floor((lLat + 90.0) / cellLatDeg).cast("int"))
      .withColumn("_cell_lon",
        pmod(floor((lLon + 180.0) / cellLonDeg).cast("int"), lit(nLon)))
    val rBase = right
      .withColumn("_rc_lat", floor((rLat + 90.0) / cellLatDeg).cast("int"))
      .withColumn("_rc_lon",
        pmod(floor((rLon + 180.0) / cellLonDeg).cast("int"), lit(nLon)))
    val neighborCells = for { dLat <- -1 to 1; dLon <- -1 to 1 } yield
      struct((col("_rc_lat") + dLat).as("_cell_lat"),
        pmod(col("_rc_lon") + dLon, lit(nLon)).as("_cell_lon"))
    val r = rBase
      .withColumn("_cell", explode(array(neighborCells: _*)))
      .withColumn("_cell_lat", col("_cell._cell_lat"))
      .withColumn("_cell_lon", col("_cell._cell_lon"))
      .drop("_cell", "_rc_lat", "_rc_lon")
    l.join(if (broadcastRight) broadcast(r) else r, Seq("_cell_lat", "_cell_lon"))
      .filter(haversineKm(lLat, lLon, rLat, rLon) <= radiusKm)
      .drop("_cell_lat", "_cell_lon")
  }

  /** Skew-safe equi-join: salt the (skewed) left side's key with a random
    * bucket in [0, saltFactor) and replicate every right-side row once per
    * bucket, so a hot key's rows spread over `saltFactor` shuffle
    * partitions instead of hammering one. Semantically identical to
    * `left.join(right, leftKey === rightKey, joinType)` for one-to-many
    * joins (right side must be unique per key or duplicates multiply —
    * same contract as the plain join).
    *
    * AQE's skew-join handling covers sort-merge joins automatically; this
    * manual form is for when AQE can't help (e.g. skew into a shuffle that
    * feeds a streaming stateful op, or a deliberately pinned plan). The
    * salt is `rand`-based and never escapes the join, so results stay
    * deterministic. */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: Column, rightKey: Column,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    // right/full outer would emit each unmatched right row once per salt
    // replica — reject rather than silently diverge from the plain join.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left-side join types, got '$joinType' " +
        "(right/full outer would duplicate unmatched right rows per salt)")
    val l = left.withColumn("_salt", (rand(seed = 42) * saltFactor).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, leftKey === rightKey && l("_salt") === r("_salt"), joinType)
      .drop("_salt")
  }

  /** AS-OF JOIN: for every left row, attach the single most recent right
    * row of the same key whose time is ≤ the left row's time (inclusive) —
    * the trade/quote, event/state-snapshot operator Spark has no built-in
    * for. Left rows with no earlier right row survive with null right
    * columns (left-outer semantics, matching DuckDB's `ASOF LEFT JOIN`).
    *
    * Shape: the scale-safe union-and-sweep plan, not a range join. Both
    * sides are tagged and unioned, then ONE window pass per key —
    * `last(right_payload, ignoreNulls)` over (time asc, right-before-left
    * at ties) — sweeps each key's timeline once, carrying the latest right
    * payload forward into every left row. Cost at 100 TB: a single hash
    * shuffle of both sides on the key plus a per-partition sort — the same
    * exchange a sort-merge equi-join would do — with NO pair explosion.
    * The naive alternative (`l.join(r, key && r.t <= l.t)` then max-per-l)
    * materializes every (left, earlier-right) pair first: quadratic per
    * key. Keys are many (users, instruments), so the per-key window
    * parallelizes across partitions — this is not a single-partition
    * funnel.
    *
    * Contract: right rows must be unique per (keys, rightTime) — dedupe
    * upstream or ties resolve nondeterministically (same contract as any
    * as-of engine). Null-time semantics match SQL comparison (and DuckDB
    * ASOF): a null-time right row can never satisfy `l.t >= r.t`, so it is
    * dropped here (Spark's asc ordering would otherwise sort it FIRST and
    * let the sweep hand it to every row of its key); a null-time left row
    * matches nothing and comes back null-padded. Payload column names must
    * not collide across sides.
    *
    * Skew exposure: each key's full timeline passes through one window
    * partition, so one pathologically hot key (a single user with millions
    * of events) serializes on one task. That is inherent to per-key as-of
    * ordering (every as-of engine sorts per key); [[asofJoinSalted]] is
    * the time-bucket-salted variant for when a hot-key family emerges —
    * result-identical (CoreOpsSpec/CorePropsSpec assert equality), one
    * extra bucket-summary pass. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one equi-key")
    val lPayload = left.columns.filterNot(keys.contains).toSeq
    val rPayload = right.columns.filterNot(keys.contains).toSeq
    val overlap = lPayload.toSet.intersect(rPayload.toSet)
    require(overlap.isEmpty, s"asofJoin column collision across sides: $overlap")
    require(lPayload.contains(leftTime) && rPayload.contains(rightTime),
      "time columns must be non-key columns of their own side")
    val rStructType = right.select(struct(rPayload.map(col): _*)).schema.head.dataType
    val l2 = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("_graft_t"), lit(1).as("_graft_side"),
        lit(null).cast(rStructType).as("_graft_r")) ++
        lPayload.map(col): _*)
    val r2 = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTime).as("_graft_t"), lit(0).as("_graft_side"),
        struct(rPayload.map(col): _*).as("_graft_r")) ++
        lPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // (time asc, side asc): a right row at exactly the left row's time
    // sorts FIRST, so equal-time matches are included — DuckDB ASOF's
    // `l.t >= r.t` semantics.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_graft_t").asc, col("_graft_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("_graft_m", last(col("_graft_r"), ignoreNulls = true).over(w))
      .filter(col("_graft_side") === 1)
      .select(keys.map(col) ++ lPayload.map(col) ++
        rPayload.map(c => col("_graft_m").getField(c).as(c)): _*)
  }

  /** Skew-mitigated AS-OF JOIN: [[asofJoin]] semantics exactly, but each
    * key's timeline is pre-split by a TIME-BUCKET salt so a hot key's
    * window sort parallelizes across buckets instead of serializing on
    * one task. Three steps:
    *
    *   1. both sides are bucketed by `bucket(time)` (MUST be monotone
    *      non-decreasing in time — e.g. `floor(unix_micros(t) / I)`;
    *      monotonicity is what makes every carried row sort strictly
    *      before all in-bucket rows, so correctness never depends on the
    *      bucket width);
    *   2. a bucket-summary pass computes, per (key, left-bucket), the
    *      latest right row of any STRICTLY earlier bucket (the boundary
    *      carry) — a window sweep over ≤ (#keys × #buckets) summary rows,
    *      not the data;
    *   3. the in-bucket sweep runs the plain union-and-sweep partitioned
    *      by (key, bucket), with the carry injected as an ordinary right
    *      row carrying its TRUE timestamp (so output columns, including
    *      derived gaps, are bit-identical to the unsalted op).
    *
    * Cost: one extra shuffle over the bucket summaries. A key with M rows
    * across B buckets sorts M/B rows per task instead of M. Same null
    * and tie semantics as [[asofJoin]] (null-time left rows land in a
    * null bucket with no rights and pad null). */
  def asofJoinSalted(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTime: String, rightTime: String,
                     bucket: Column => Column): DataFrame = {
    require(keys.nonEmpty, "asofJoinSalted needs at least one equi-key")
    val lPayload = left.columns.filterNot(keys.contains).toSeq
    val rPayload = right.columns.filterNot(keys.contains).toSeq
    val overlap = lPayload.toSet.intersect(rPayload.toSet)
    require(overlap.isEmpty, s"asofJoinSalted column collision across sides: $overlap")
    require(lPayload.contains(leftTime) && rPayload.contains(rightTime),
      "time columns must be non-key columns of their own side")
    val rStructType = right.select(struct(rPayload.map(col): _*)).schema.head.dataType
    val tType = left.schema(leftTime).dataType
    val bkt = "_graft_bkt"
    val lNulls = lPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c))

    val l2 = left.select(
      keys.map(col) ++ Seq(
        bucket(col(leftTime)).as(bkt),
        col(leftTime).as("_graft_t"), lit(1).as("_graft_side"),
        lit(null).cast(rStructType).as("_graft_r")) ++
        lPayload.map(col): _*)
    val r2 = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++ Seq(
        bucket(col(rightTime)).as(bkt),
        col(rightTime).as("_graft_t"), lit(0).as("_graft_side"),
        struct(rPayload.map(col): _*).as("_graft_r")) ++ lNulls: _*)

    // Step 2: boundary carries. Last right per (key, bucket), then a sweep
    // over bucket ids: a left-bucket marker (_graft_bs=0) sorts before the
    // same bucket's right summary (_graft_bs=1), so `last` hands it the
    // latest right of strictly-earlier buckets only.
    val lastW = Window.partitionBy((keys :+ bkt).map(col): _*)
      .orderBy(col("_graft_t").desc)
    val lastPerBucket = r2
      .withColumn("_graft_rn", row_number().over(lastW))
      .filter(col("_graft_rn") === 1)
      .select(keys.map(col) ++ Seq(col(bkt), lit(1).as("_graft_bs"),
        col("_graft_t"), col("_graft_r")): _*)
    val marks = l2.select((keys :+ bkt).map(col): _*).distinct()
      .select(keys.map(col) ++ Seq(col(bkt), lit(0).as("_graft_bs"),
        lit(null).cast(tType).as("_graft_t"),
        lit(null).cast(rStructType).as("_graft_r")): _*)
    val carryW = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(bkt).asc, col("_graft_bs").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carries = lastPerBucket.unionByName(marks)
      .withColumn("_graft_cr", last(col("_graft_r"), ignoreNulls = true).over(carryW))
      .withColumn("_graft_ct", last(col("_graft_t"), ignoreNulls = true).over(carryW))
      .filter(col("_graft_bs") === 0 && col("_graft_cr").isNotNull)
      .select(keys.map(col) ++ Seq(col(bkt),
        col("_graft_ct").as("_graft_t"), lit(0).as("_graft_side"),
        col("_graft_cr").as("_graft_r")) ++ lNulls: _*)

    // Step 3: the plain sweep, partitioned by (key, bucket). A carry's
    // true timestamp is strictly below every in-bucket time (monotone
    // bucket fn), so it sorts first and loses to any real in-bucket right.
    val w = Window.partitionBy((keys :+ bkt).map(col): _*)
      .orderBy(col("_graft_t").asc, col("_graft_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2).unionByName(carries)
      .withColumn("_graft_m", last(col("_graft_r"), ignoreNulls = true).over(w))
      .filter(col("_graft_side") === 1)
      .select(keys.map(col) ++ lPayload.map(col) ++
        rPayload.map(c => col("_graft_m").getField(c).as(c)): _*)
  }

  /** Morton (Z-order) interleave of two 16-bit nonnegative values into a
    * 32-bit key: bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1, via the classic mask-and-shift bit spreading — pure integer
    * column arithmetic (codegen'd, bit-identical in any engine; the
    * DuckDB oracle restates the same five steps). Rows sorted or
    * bucketed by this key cluster in BOTH dimensions at once — the
    * data-layout primitive behind multi-dimensional file skipping
    * (Z-ORDER in lakehouse engines): with 2^(2k) range buckets, each
    * bucket spans ~1/2^k of EACH dimension, so a selective predicate on
    * either column prunes ~all non-matching buckets, where a
    * lexicographic sort clusters only its leading column. */
  def mortonInterleave16(a: Column, b: Column): Column = {
    def spread(x0: Column): Column =
      Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L),
        (1, 0x55555555L))
        .foldLeft(x0.bitwiseAND(lit(0xFFFFL))) { case (x, (s, mask)) =>
          x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(mask))
        }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Most-frequent value of `valueCol` per `keyCol` with a total tie-break
    * (higher count wins, then smaller value) — the reference's mode idiom
    * (flights_lookup_to_kafka.py:30-46): groupBy + count + row_number. */
  def modeByKey(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val counts = df.groupBy(keyCol, valueCol).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(keyCol).orderBy(desc("cnt"), asc(valueCol))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "cnt")
  }
}
