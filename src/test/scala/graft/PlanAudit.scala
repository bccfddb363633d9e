package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Structural plan auditing shared by the pin specs — the round-12 q90
  * finding (a corpus-derived table funneling through `Exchange
  * SinglePartition`) was caught by a human reading PLANS.md; these
  * helpers make the dump grep itself so the next one is caught by CI.
  *
  * The invariant they express: a SinglePartition shuffle is only ever
  * acceptable when the rows crossing it are BOUNDED — a global
  * aggregate's partials (≤ 1 row per input partition), or an
  * explicitly-adjudicated tiny table (per-source totals, bucket
  * offsets, nlist centroids). Anything carrying explode (Generate)
  * output is data-proportional by construction and must never cross
  * one.
  */
object PlanAudit {

  /** The real physical tree — unwraps the AQE leaf wrapper. */
  def physical(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  /** Children of every SinglePartition shuffle in the plan (subqueries
    * included — a scalar-subquery funnel is the same hazard). */
  def singlePartitionChildren(df: DataFrame): Seq[SparkPlan] =
    collectAll(physical(df)).collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        e.child
    }

  /** Tree collect that also descends into codegen wrappers and
    * subquery expressions (plain .collect stops at WholeStageCodegen's
    * `InputAdapter` boundaries only for printing, but subquery plans
    * hang off expressions, not children). */
  def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val subqueries = p.flatMap(_.expressions.flatMap(_.collect {
      case sq: org.apache.spark.sql.execution.ScalarSubquery => sq.plan
      case sq: org.apache.spark.sql.execution.InSubqueryExec => sq.plan
    }))
    (p +: subqueries.toSeq).flatMap(_.collect { case n => n })
  }

  /** Does the subtree contain an explode/posexplode (Generate)? Explode
    * output is corpus-proportional — the one static signal that rows
    * below are NOT bounded by an upstream aggregate's key domain. */
  def hasGenerate(p: SparkPlan): Boolean =
    p.collect { case g: GenerateExec => g }.nonEmpty

  /** Skip nodes that never change cardinality class to find what a
    * shuffle actually funnels. */
  @annotation.tailrec
  def firstNonTrivial(p: SparkPlan): SparkPlan = p match {
    case w: WholeStageCodegenExec => firstNonTrivial(w.child)
    case i: InputAdapter => firstNonTrivial(i.child)
    case pr: ProjectExec => firstNonTrivial(pr.child)
    case c: ColumnarToRowExec => firstNonTrivial(c.child)
    case s: SerializeFromObjectExec => firstNonTrivial(s.child)
    case other => other
  }

  /** A SinglePartition exchange is statically benign when it feeds a
    * global aggregate: the child is the PARTIAL of an aggregate with no
    * grouping keys, so at most one row per input partition crosses.
    * Everything else needs a per-query adjudication. */
  def isGlobalAggPartial(child: SparkPlan): Boolean =
    firstNonTrivial(child) match {
      case a: BaseAggregateExec => a.groupingExpressions.isEmpty
      case _ => false
    }

  /** The sweep verdict for one query plan: SinglePartition exchanges
    * that are neither global-agg partials nor free of Generate output —
    * i.e. candidates for the q90-class bug. Returned as descriptions so
    * the failing assertion names the funnel. */
  def suspectFunnels(df: DataFrame): Seq[String] =
    singlePartitionChildren(df).filterNot(isGlobalAggPartial).collect {
      case child if hasGenerate(child) =>
        s"SinglePartition over explode-derived rows:\n${child.treeString}"
    }
}
