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
  )
}
