package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene for SparkEntry: a Scala forward *val* reference inside
  * the object initializes to null silently — round 16 shipped exactly that
  * (scd2RebuildOracle declared after the mixCascadeOracles val that used
  * it), which NPE'd Verify before oracle_sql.json was written and zeroed
  * the driver's correctness artifact for all 146 queries. This spec makes
  * that failure class a compile-to-test-time error: every registered
  * oracle string and query function must be non-null, and every oracle key
  * must name a registered query. Pure registry introspection — no Spark
  * session, so it runs in milliseconds. */
class OracleRegistrySpec extends AnyFunSuite {

  test("every oracleSql entry is non-null (no forward val references)") {
    val nullKeys = SparkEntry.oracleSql.collect {
      case (k, v) if k == null || v == null => String.valueOf(k)
    }
    assert(nullKeys.isEmpty,
      s"null oracle entries (forward val reference?): ${nullKeys.mkString(", ")}")
  }

  test("every oracleSql entry is non-empty SQL text") {
    val blank = SparkEntry.oracleSql.collect {
      case (k, v) if v.trim.isEmpty => k
    }
    assert(blank.isEmpty, s"blank oracle SQL for: ${blank.mkString(", ")}")
  }

  test("every queries entry has a non-null function") {
    val nullFns = SparkEntry.queries.collect {
      case (k, fn) if k == null || fn == null => String.valueOf(k)
    }
    assert(nullFns.isEmpty,
      s"null query registrations: ${nullFns.mkString(", ")}")
  }

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracle entries with no matching query: ${orphans.mkString(", ")}")
  }

  /** The other direction (round-17 advice): a query registered WITHOUT an
    * oracle entry is dumped to parquet but never compared by the driver —
    * a silently-unchecked query. The only sanctioned exception is q18,
    * whose HLL output is engine-specific by design (documented in
    * COVERAGE.md); anything else added here needs the same documentation
    * trail. */
  test("every registered query has an oracle entry (q18 is the one documented exception)") {
    val noOracleAllowed = Set("q18_windowed_approx_distinct")
    val unchecked =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- noOracleAllowed
    assert(unchecked.isEmpty,
      s"queries with no oracle entry (driver would never compare them): ${unchecked.mkString(", ")}")
  }
}
