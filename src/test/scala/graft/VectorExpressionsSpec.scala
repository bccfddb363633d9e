package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorExpressions

/** The native graft_dot expression must be bit-identical to the pure-HOF
  * form (same widen-to-double, same left-to-right accumulation) in both
  * the codegen and interpreted paths. */
class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, -0.6f)),
      (3L, Array.tabulate(64)(i => (i * 0.37f - 3.1f)), Array.tabulate(64)(i => (2.2f - i * 0.11f))))
      .toDF("id", "a", "b")
  }

  test("graft_dot equals the HOF aggregate(zip_with(...)) bit-for-bit") {
    VectorExpressions.register(spark)
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = vecs.select(
      call_function("graft_dot", col("a"), col("b")).as("native"), hof.as("ref"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot participates in whole-stage codegen") {
    VectorExpressions.register(spark)
    // range source so the projection isn't constant-folded to a LocalTableScan
    val df = spark.range(10)
      .select(
        transform(sequence(lit(1), lit(8)), i => (col("id") + i).cast("float")).as("a"),
        transform(sequence(lit(1), lit(8)), i => (col("id") * i).cast("float")).as("b"))
      .select(call_function("graft_dot", col("a"), col("b")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"expected codegen in plan:\n$plan")
    assert(df.collect().length == 10)
  }

  /** The nested-HOF form graft_lsh_bucket replaced (kept here as the
    * reference implementation for bit-parity): Σ_p (proj_p(v) > 0) << p,
    * proj_p(v) = Σ_i w(p,i)·v[i], w from the Knuth multiplicative hash. */
  private def hofLshBucket(v: org.apache.spark.sql.Column, nPlanes: Int, dim: Int) = {
    def planeW(p: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      ((((p * 131071L + i * 524287L) * 2654435761L) % 1000003L).cast("double") /
        1000003.0) - 0.5
    def pow2(p: org.apache.spark.sql.Column) =
      round(pow(lit(2.0), p.cast("double"))).cast("long")
    aggregate(sequence(lit(0), lit(nPlanes - 1)), lit(0L), (acc, p) => {
      val s = aggregate(sequence(lit(1), lit(dim)), lit(0.0),
        (a, i) => a + planeW(p, i) * element_at(v, i).cast("double"))
      acc + when(s > 0, pow2(p)).otherwise(lit(0L))
    })
  }

  test("graft_lsh_bucket equals the nested-HOF form on pseudo-random vectors") {
    VectorExpressions.register(spark)
    import spark.implicits._
    // Deterministic pseudo-random 64-dim vectors spanning sign changes.
    val df = (1 to 200).map { r =>
      (r.toLong, Array.tabulate(64)(i =>
        (((r * 2654435761L + i * 40503L) % 1997L).toFloat / 1997f) - 0.5f))
    }.toDF("id", "v")
    for (planes <- Seq(4, 8)) {
      val rows = df.select(
        call_function("graft_lsh_bucket", col("v"), lit(planes)).as("native"),
        hofLshBucket(col("v"), planes, 64).as("ref")).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"planes=$planes native=${r.getLong(0)} ref=${r.getLong(1)}"))
      // every bucket fits in nPlanes bits
      rows.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) < (1L << planes)))
    }
  }

  test("graft_lsh_bucket participates in whole-stage codegen") {
    VectorExpressions.register(spark)
    val df = spark.range(10)
      .select(transform(sequence(lit(1), lit(64)),
        i => (col("id") - i).cast("float")).as("v"))
      .select(call_function("graft_lsh_bucket", col("v"), lit(8)).as("b"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"expected codegen in plan:\n$plan")
    assert(df.collect().length == 10)
  }

  test("null array yields null") {
    VectorExpressions.register(spark)
    import spark.implicits._
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(call_function("graft_dot", col("a"), col("b")).as("d"))
    assert(df.collect().head.isNullAt(0))
  }

  test("graft_overlap equals size(array_intersect) on sorted arrays — incl. duplicates") {
    VectorExpressions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // Random sorted arrays with deliberate duplicates (56-bit collisions
    // are possible in the real hs arrays), plus the structural edges.
    val cases = Seq.fill(60) {
      def arr() = Array.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).sorted
      (arr(), arr())
    } ++ Seq(
      (Array.empty[Long], Array(1L, 2L)),
      (Array(5L, 5L, 5L), Array(5L)),          // dup-heavy: counts once
      (Array(1L, 3L, 5L), Array(2L, 4L, 6L)),  // disjoint
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)))
    val rows = cases.toDF("a", "b").select(
      call_function("graft_overlap", col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("graft_overlap participates in whole-stage codegen and matches interpreted") {
    VectorExpressions.register(spark)
    val df = spark.range(50)
      .select(
        sort_array(transform(sequence(lit(1), lit(12)),
          i => (col("id") * i % 17))).as("a"),
        sort_array(transform(sequence(lit(1), lit(12)),
          i => (col("id") + i * 3) % 17)).as("b"))
      .select(call_function("graft_overlap", col("a"), col("b")).as("c"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"expected codegen in plan:\n$plan")
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
