package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the round-7 operators (the PLANS.md contract,
  * asserted instead of eyeballed — GeoGridRuleSpec pattern): the SHAPE
  * that makes q57/q58 scale-safe must survive refactors.
  *
  *   - q57: the full-cardinality bigram relation is NEVER hash-shuffled;
  *     the only hash exchange is the exact count keyed on the ≤ k
  *     broadcast-joined candidates (plus the sketch's single-partition
  *     fold and the final order-by range exchange).
  *   - q58: the as-of join is the union-and-sweep — no join operator at
  *     all in the plan, one window sweep, key-hash exchanges bounded by
  *     the upstream dedup + the window (never a range-pair explosion).
  */
class PlanPinsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def hashExchanges(plan: String): Seq[String] =
    "Exchange hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq

  test("q57: exact pass shuffles only on the broadcast candidate join") {
    val plan = SparkEntry.queries("q57_boilerplate_ngrams")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_mg_candidates"),
      s"sketch aggregate missing from plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate join is not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"unexpected join strategy:\n$plan")
    val hx = hashExchanges(plan)
    // ONE hash exchange: the post-join exact groupBy (keyed on tok +
    // n_total). A second would mean the raw bigram universe is being
    // shuffled — exactly what the sketch pass exists to avoid.
    assert(hx.size == 1 && hx.head.contains("tok"),
      s"expected exactly one hash exchange on the candidate-joined slots, got $hx:\n$plan")
  }

  test("q59: per-doc repetition is map-only — zero hash exchanges") {
    val plan = SparkEntry.queries("q59_docs_repetition")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val hx = hashExchanges(plan)
    assert(hx.isEmpty,
      s"per-doc fold must not shuffle, got hash exchanges $hx:\n$plan")
  }

  test("q61: sessionization plans ONE exchange — window partitioning feeds the groupBy") {
    val plan = SparkEntry.queries("q61_batch_sessionize")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"no window in plan:\n$plan")
    val hx = hashExchanges(plan)
    // hashpartitioning(user_id) for the lag/cumsum window also satisfies
    // the (user_id, sid) groupBy's clustering (subset co-locates the
    // superset) — a second exchange would mean Spark re-shuffled data
    // that is already key-local.
    assert(hx.size == 1 && hx.head.contains("user_id"),
      s"expected exactly one user_id exchange, got $hx:\n$plan")
  }

  test("q58: as-of join is the union-and-sweep — window pass, no join operator") {
    val plan = SparkEntry.queries("q58_asof_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"no window sweep in plan:\n$plan")
    Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct").foreach(j =>
      assert(!plan.contains(j), s"as-of must not plan a $j:\n$plan"))
    // Key-hash exchanges only: the right-side dedup groupBy and the
    // window's user_id partitioning — both keyed, neither a pair blowup.
    val hx = hashExchanges(plan)
    assert(hx.size <= 2 && hx.forall(_.contains("user_id")),
      s"unexpected exchanges $hx:\n$plan")
  }
}
