package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based-optimizer demonstration (the one Catalyst layer PLANS.md
  * didn't yet exercise): ANALYZE-collected statistics must CHANGE a plan.
  *
  * Setup: lineitem at sf0.01 is ~1 MB on disk; `l_quantity <= 2` keeps
  * ~3.9% of rows. With the broadcast threshold pinned at 256 KB:
  *
  *   - no stats → the filtered side is estimated at FILE size (~1 MB),
  *     above threshold on both sides → SortMergeJoin;
  *   - ANALYZE row + column stats, CBO on → FilterEstimation shrinks the
  *     side to ~4% via the l_quantity min/max/ndv → BroadcastHashJoin;
  *   - same stats, CBO off → size-only estimation ignores the predicate
  *     → SortMergeJoin again, pinning that the flip is genuinely
  *     cost-based, not a side effect of ANALYZE's size refresh.
  *
  * This is the spec counterpart of q92's one-scan stats collector: q92
  * computes ANALYZE's numbers as a query; this pins what the numbers DO. */
class CboSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kv.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach { case (k, o) =>
      o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("ANALYZE statistics flip the selective join side to broadcast — and only under CBO") {
    spark.sql("DROP TABLE IF EXISTS cbo_lineitem")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.mode("overwrite").saveAsTable("cbo_lineitem")
    try {
      withConfs(
        // AQE off: this pins the STATIC cost-based decision; AQE's
        // runtime size rescue is AqeSpec's subject, not CBO's.
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.cbo.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "262144") {
        def plan: String = {
          // No projections anywhere: column pruning discounts the scan's
          // size estimate by read-schema width, which would sink the
          // no-stats side below the threshold on its own and mask the
          // CBO effect this spec exists to pin.
          val big = spark.read.parquet(s"$sf/lineitem.parquet")
          spark.table("cbo_lineitem")
            .filter(col("l_quantity") <= 2)
            .join(big, "l_orderkey")
            .queryExecution.sparkPlan.toString
        }
        assert(plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
          s"without stats, the file-size estimate (~1 MB) must exceed the 256 KB threshold:\n$plan")

        spark.sql("ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS")
        spark.sql("ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS FOR COLUMNS l_quantity")
        assert(plan.contains("BroadcastHashJoin"),
          s"with row + l_quantity column stats, the ~4% filter estimate must broadcast:\n$plan")

        spark.conf.set("spark.sql.cbo.enabled", "false")
        assert(plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
          s"size-only estimation must ignore the predicate — the flip has to be CBO's doing:\n$plan")
      }
    } finally spark.sql("DROP TABLE IF EXISTS cbo_lineitem")
  }

  test("CBO join reorder rewrites the written left-deep order from statistics") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    Seq("cbo_l", "cbo_o", "cbo_c").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.read.parquet(s"$sf/lineitem.parquet").write.saveAsTable("cbo_l")
    spark.read.parquet(s"$sf/orders.parquet").write.saveAsTable("cbo_o")
    spark.read.parquet(s"$sf/customer.parquet").write.saveAsTable("cbo_c")
    try {
      // The query is WRITTEN worst-first: the two big tables join before
      // the selective customer filter can shrink anything.
      def innermostJoinLeaves: Set[String] = {
        val plan: LogicalPlan = spark.sql(
          """SELECT l.l_quantity, o.o_totalprice, c.c_name
            |FROM cbo_l l
            |JOIN cbo_o o ON l.l_orderkey = o.o_orderkey
            |JOIN cbo_c c ON o.o_custkey = c.c_custkey
            |WHERE c.c_nationkey = 3""".stripMargin)
          .queryExecution.optimizedPlan
        val joins = plan.collect { case j: Join => j }
        assert(joins.size == 2, s"expected a two-join tree:\n$plan")
        // collect is pre-order, so the LAST join is the innermost one.
        joins.last.collectLeaves()
          .flatMap(_.toString.linesIterator.take(1))
          .map(l => Seq("cbo_l", "cbo_o", "cbo_c").find(l.contains).getOrElse(l))
          .toSet
      }
      withConfs(
        "spark.sql.cbo.enabled" -> "true",
        "spark.sql.cbo.joinReorder.enabled" -> "true") {
        assert(innermostJoinLeaves == Set("cbo_l", "cbo_o"),
          "without stats the written order must survive — reorder has no costs to work with")
        Seq("cbo_l", "cbo_o", "cbo_c").foreach { t =>
          spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
        }
        spark.sql("ANALYZE TABLE cbo_c COMPUTE STATISTICS FOR COLUMNS c_custkey, c_nationkey")
        spark.sql("ANALYZE TABLE cbo_o COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_custkey")
        spark.sql("ANALYZE TABLE cbo_l COMPUTE STATISTICS FOR COLUMNS l_orderkey")
        val reordered = innermostJoinLeaves
        assert(reordered.contains("cbo_c") && reordered != Set("cbo_l", "cbo_o"),
          s"with stats, reorder must join through the filtered customer side first, got $reordered")
      }
    } finally
      Seq("cbo_l", "cbo_o", "cbo_c").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
