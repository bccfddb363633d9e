package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Parity-plus relational operators SURVEY §2 marks as absent from the
  * reference but trivially available in Spark — implemented so a user of
  * this engine has the full relational vocabulary (semi/anti joins,
  * rollup grouping sets).
  */
object ParityPlusQueries {

  /** Left semi + left anti joins: per nation, how many customers have at
    * least one order vs none. Both joins broadcast the aggregated key set
    * side at scale would instead shuffle on the equi key — Catalyst picks;
    * the semantic point is existence testing without row duplication. */
  def q38SemiAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val orders = Tables(spark, dir, "orders")
    val nation = Tables(spark, dir, "nation")
    val withOrders = cust
      .join(orders, cust("c_custkey") === orders("o_custkey"), "left_semi")
      .groupBy("c_nationkey").agg(count(lit(1)).as("with_orders"))
    val withoutOrders = cust
      .join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")
      .groupBy("c_nationkey").agg(count(lit(1)).as("without_orders"))
    withOrders
      .join(withoutOrders, Seq("c_nationkey"), "outer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"), "left")
      .select(col("n_name").as("nation"),
        coalesce(col("with_orders"), lit(0L)).as("with_orders"),
        coalesce(col("without_orders"), lit(0L)).as("without_orders"))
      .orderBy("nation")
  }

  /** ROLLUP grouping sets over the route-shaped keys: per (flag, status),
    * per flag subtotal, and grand total in one pass — Spark expands to a
    * single shuffle with grouping-id, no N-pass union. Natural data has no
    * nulls in these columns, so the rollup nulls are safely labeled ALL. */
  def q39Rollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("flight_count"),
        round(sum("l_quantity"), 2).as("total_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("flight_count"), col("total_qty"))
      .orderBy("flag", "status")
  }
}
