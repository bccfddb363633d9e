package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 appears in at least one
  * `queries` entry; entries with a DuckDB-expressible equivalent also appear
  * in `oracleSql` (same column names, same total ORDER BY — the driver
  * hash-compares values after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    BatchQueries.q01SupplierStats(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_supplier_stats" -> (BatchQueries.q01SupplierStats _),
    "q02_nation_order_stats" -> (BatchQueries.q02NationOrderStats _),
    "q03_busiest_suppliers" -> (BatchQueries.q03BusiestSuppliers _),
    "q04_busiest_weeks" -> (BatchQueries.q04BusiestWeeks _),
    "q05_global_avg_unpivot" -> (BatchQueries.q05GlobalAvgUnpivot _),
    "q06_cancellations_dow" -> (BatchQueries.q06CancellationsDow _),
    "q07_price_buckets" -> (BatchQueries2.q07PriceBuckets _),
    "q08_problematic_routes" -> (BatchQueries2.q08ProblematicRoutes _),
    "q09_attr_unpivot" -> (BatchQueries2.q09AttrUnpivot _),
    "q10_mode_rank" -> (BatchQueries2.q10ModeRank _),
    "q11_delay_score" -> (BatchQueries2.q11DelayScore _),
    "q12_enrich_join" -> (BatchQueries2.q12EnrichJoin _),
    "q13_scalar_funcs" -> (BatchQueries2.q13ScalarFuncs _),
    "q14_geo_join" -> (BatchQueries2.q14GeoJoin _),
    "q15_distinct_years" -> (BatchQueries2.q15DistinctYears _),
    "q16_json_extract" -> (EventQueries.q16JsonExtract _),
    "q17_windowed_distinct" -> (EventQueries.q17WindowedDistinct _),
    "q18_windowed_approx_distinct" -> (EventQueries.q18WindowedApproxDistinct _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_supplier_stats" ->
      """SELECT t.l_suppkey, s.s_name, t.avg_err, t.flight_count,
        |       round((1.0 - CAST(t.delayed_count AS DOUBLE) / t.flight_count) * 100.0, 4) AS otp
        |FROM (
        |  SELECT l_suppkey,
        |         round(avg(abs(l_extendedprice - l_quantity * 1000.0)), 4) AS avg_err,
        |         count(*) AS flight_count,
        |         count(CASE WHEN l_discount > 0.05 THEN 1 END) AS delayed_count
        |  FROM lineitem GROUP BY l_suppkey HAVING count(*) > 10
        |) t LEFT JOIN supplier s ON t.l_suppkey = s.s_suppkey
        |ORDER BY otp DESC, t.l_suppkey""".stripMargin,
    "q02_nation_order_stats" ->
      """SELECT n.n_name,
        |       round(avg(o.o_totalprice), 4) AS avg_total_price,
        |       count(*) AS order_count
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name HAVING count(*) > 10
        |ORDER BY avg_total_price DESC, n.n_name""".stripMargin,
    "q03_busiest_suppliers" ->
      """SELECT l_suppkey, flight_count,
        |       round(CASE WHEN _max = _min THEN 100.0
        |             ELSE CAST(flight_count - _min AS DOUBLE) / (_max - _min) * 100.0 END, 4) AS busyness_pct,
        |       round(CASE WHEN _total > 0 THEN CAST(flight_count AS DOUBLE) / _total * 100.0 END, 4) AS share_pct
        |FROM (
        |  SELECT l_suppkey, count(*) AS flight_count,
        |         min(count(*)) OVER () AS _min,
        |         max(count(*)) OVER () AS _max,
        |         sum(count(*)) OVER () AS _total
        |  FROM lineitem GROUP BY l_suppkey
        |) ORDER BY flight_count DESC, l_suppkey LIMIT 10""".stripMargin,
    "q04_busiest_weeks" ->
      """SELECT CAST(month(l_shipdate) AS BIGINT) AS ship_month,
        |       CAST(weekofyear(l_shipdate) AS BIGINT) AS ship_week,
        |       count(*) AS flight_count,
        |       count(CASE WHEN l_discount > 0.05 THEN 1 END) AS delayed_count,
        |       round(CAST(count(CASE WHEN l_discount > 0.05 THEN 1 END) AS DOUBLE) / count(*) * 100.0, 4) AS delayed_pct
        |FROM lineitem
        |GROUP BY 1, 2 HAVING count(*) > 10
        |ORDER BY flight_count DESC, ship_month, ship_week""".stripMargin,
    "q05_global_avg_unpivot" ->
      """WITH g AS (
        |  SELECT round(avg(l_quantity), 4) AS avg_quantity,
        |         round(avg(l_extendedprice), 4) AS avg_price,
        |         round(avg(l_discount), 6) AS avg_discount,
        |         round(avg(l_tax), 6) AS avg_tax,
        |         round(avg(l_linenumber), 4) AS avg_linenumber
        |  FROM lineitem)
        |SELECT 'quantity' AS metric, avg_quantity AS avg_value FROM g
        |UNION ALL SELECT 'price', avg_price FROM g
        |UNION ALL SELECT 'discount', avg_discount FROM g
        |UNION ALL SELECT 'tax', avg_tax FROM g
        |UNION ALL SELECT 'linenumber', avg_linenumber FROM g
        |ORDER BY metric""".stripMargin,
    "q06_cancellations_dow" ->
      """SELECT CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |       count(*) AS order_count,
        |       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS cancelled_count,
        |       round(CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS DOUBLE) / count(*) * 100.0, 4) AS cancelled_pct
        |FROM orders
        |GROUP BY 1 HAVING count(*) > 10
        |ORDER BY cancelled_pct DESC, dow""".stripMargin,
    "q07_price_buckets" ->
      """WITH b AS (
        |  SELECT CASE WHEN l_extendedprice >= 0 AND l_extendedprice < 10000 THEN 0
        |              WHEN l_extendedprice >= 10000 AND l_extendedprice < 20000 THEN 1
        |              WHEN l_extendedprice >= 20000 AND l_extendedprice < 30000 THEN 2
        |              WHEN l_extendedprice >= 30000 AND l_extendedprice < 40000 THEN 3
        |              WHEN l_extendedprice >= 40000 AND l_extendedprice < 50000 THEN 4
        |              WHEN l_extendedprice >= 50000 THEN 5 END AS bucket_id,
        |         l_extendedprice, l_discount FROM lineitem)
        |SELECT CAST(bucket_id AS BIGINT) AS bucket_id,
        |       CASE bucket_id WHEN 0 THEN '0-10000' WHEN 1 THEN '10000-20000'
        |            WHEN 2 THEN '20000-30000' WHEN 3 THEN '30000-40000'
        |            WHEN 4 THEN '40000-50000' WHEN 5 THEN '50000+' END AS bucket_label,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       count(*) AS flight_count,
        |       round(CAST(count(CASE WHEN l_discount > 0.05 THEN 1 END) AS DOUBLE) / count(*), 6) AS delay_probability
        |FROM b GROUP BY bucket_id HAVING count(*) > 10
        |ORDER BY bucket_id""".stripMargin,
    "q08_problematic_routes" ->
      """SELECT * FROM (
        |  SELECT g.origin_code || '-' || g.dest_code AS route,
        |         g.origin_code, g.dest_code, g.flight_count,
        |         round(CASE WHEN ov._overall_pct > 0
        |               THEN (CAST(g.delayed_count AS DOUBLE) / g.flight_count * 100.0) / ov._overall_pct
        |               ELSE 1.0 END, 6) AS problematic_score
        |  FROM (SELECT l_returnflag AS origin_code, l_linestatus AS dest_code,
        |               count(*) AS flight_count,
        |               count(CASE WHEN l_discount > 0.05 THEN 1 END) AS delayed_count
        |        FROM lineitem GROUP BY 1, 2 HAVING count(*) > 10) g
        |  CROSS JOIN (SELECT CAST(count(CASE WHEN l_discount > 0.05 THEN 1 END) AS DOUBLE) / count(*) * 100.0 AS _overall_pct
        |              FROM lineitem) ov)
        |WHERE problematic_score >= 0.5
        |ORDER BY problematic_score DESC, route""".stripMargin,
    "q09_attr_unpivot" ->
      """WITH u AS (
        |  SELECT 'brand' AS attr, p_brand AS attr_value FROM part
        |  UNION ALL SELECT 'type', p_type FROM part
        |  UNION ALL SELECT 'name', p_name FROM part)
        |SELECT attr, attr_value, count(*) AS value_count
        |FROM u WHERE attr_value IS NOT NULL AND trim(attr_value) <> ''
        |GROUP BY attr, attr_value HAVING count(*) > 5
        |ORDER BY value_count DESC, attr, attr_value""".stripMargin,
    "q10_mode_rank" ->
      """WITH pc AS (SELECT o_custkey, o_orderpriority AS v, count(*) AS cnt FROM orders GROUP BY 1, 2),
        |pm AS (SELECT o_custkey, v AS mode_priority FROM (
        |  SELECT o_custkey, v, row_number() OVER (PARTITION BY o_custkey ORDER BY cnt DESC, v ASC) AS rn FROM pc) WHERE rn = 1),
        |sc AS (SELECT o_custkey, o_orderstatus AS v, count(*) AS cnt FROM orders GROUP BY 1, 2),
        |sm AS (SELECT o_custkey, v AS mode_status FROM (
        |  SELECT o_custkey, v, row_number() OVER (PARTITION BY o_custkey ORDER BY cnt DESC, v ASC) AS rn FROM sc) WHERE rn = 1)
        |SELECT pm.o_custkey, pm.mode_priority, sm.mode_status
        |FROM pm JOIN sm ON pm.o_custkey = sm.o_custkey
        |ORDER BY pm.o_custkey""".stripMargin,
    "q11_delay_score" ->
      """WITH j AS (
        |  SELECT t.l_suppkey, s.s_name, t.avg_disc, t.flight_count FROM (
        |    SELECT l_suppkey, round(avg(l_discount), 6) AS avg_disc, count(*) AS flight_count
        |    FROM lineitem GROUP BY l_suppkey HAVING count(*) > 10) t
        |  JOIN (SELECT DISTINCT s_suppkey, s_name FROM supplier) s ON t.l_suppkey = s.s_suppkey),
        |b AS (SELECT min(avg_disc) AS _mn, max(avg_disc) AS _mx FROM j)
        |SELECT l_suppkey, s_name, avg_disc, flight_count,
        |       round(CASE WHEN _mx = _mn THEN 1.0
        |             ELSE (avg_disc - _mn) / (_mx - _mn) * 1.0 END, 6) AS delay_score01
        |FROM j CROSS JOIN b
        |ORDER BY delay_score01 DESC, l_suppkey""".stripMargin,
    "q12_enrich_join" ->
      """SELECT c_custkey, c_name, n_name AS nation_name, r_name AS region_name,
        |       round(c_acctbal, 2) AS acctbal
        |FROM customer
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,
    "q13_scalar_funcs" ->
      """SELECT s_suppkey,
        |       printf('%02d:%02d', (s_suppkey * 137 % 2400) // 100, s_suppkey * 137 % 2400 % 100) AS sched_time,
        |       CASE WHEN length(cs) = 0 THEN 'UNKNOWN'
        |            WHEN substr(cs, 1, 1) = 'N' THEN 'PRIVATE'
        |            WHEN length(cs) < 3 THEN cs
        |            ELSE substr(cs, 1, 3) END AS airline_code,
        |       CAST(regexp_extract(s_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
        |       CAST(length(trim(s_name)) AS BIGINT) AS name_len
        |FROM (SELECT *, upper(trim(upper(substr(trim(s_name), 1, 1)) || CAST(s_suppkey AS VARCHAR))) AS cs
        |      FROM supplier)
        |ORDER BY s_suppkey""".stripMargin,
    "q14_geo_join" ->
      """WITH ap AS (SELECT n_name, CAST(n_nationkey * 7 % 120 - 60 AS DOUBLE) AS ap_lat,
        |                   CAST(n_nationkey * 13 % 360 - 180 AS DOUBLE) AS ap_lon FROM nation),
        |ev AS (SELECT user_id, CAST(event_id * 17 % 120 - 60 AS DOUBLE) AS ev_lat,
        |              CAST(event_id * 29 % 360 - 180 AS DOUBLE) AS ev_lon FROM events),
        |m AS (SELECT n_name, user_id,
        |             pow(sin(radians(ap_lat - ev_lat) / 2), 2)
        |               + cos(radians(ev_lat)) * cos(radians(ap_lat)) * pow(sin(radians(ap_lon - ev_lon) / 2), 2) AS a
        |      FROM ev CROSS JOIN ap)
        |SELECT n_name AS airport, count(*) AS match_count,
        |       count(DISTINCT user_id) AS distinct_aircraft
        |FROM m WHERE 2 * 6371.0 * atan2(sqrt(a), sqrt(1.0 - a)) <= 800.0
        |GROUP BY n_name ORDER BY airport""".stripMargin,
    "q15_distinct_years" ->
      """SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS order_year
        |FROM orders ORDER BY order_year""".stripMargin,
    "q16_json_extract" ->
      """SELECT event_type, count(*) AS event_count,
        |       round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 4) AS avg_k,
        |       round(avg(value), 4) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q17_windowed_distinct" ->
      """SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
        |       event_type, count(DISTINCT user_id) AS distinct_users
        |FROM events GROUP BY 1, 2 HAVING count(DISTINCT user_id) >= 2
        |ORDER BY win_start, event_type""".stripMargin,
    // q18_windowed_approx_distinct: HLL sketch is engine-specific -> no
    // oracle; the driver records a rows-only check.
  )
}
