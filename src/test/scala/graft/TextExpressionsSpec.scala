package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{NfcNormalize, TextExpressions}

/** graft_nfc must agree with the JDK normalizer in both eval paths, pass
  * already-normalized input through unchanged, and stay inside
  * whole-stage codegen (the reason it is an expression, not a UDF).
  * Unicode is written as escapes so the source stays ASCII (u0301 is
  * COMBINING ACUTE, u00e9 precomposed e-acute). */
class TextExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val decomposed = "cafe\u0301 du bre\u0301sil"
  private val composed = "caf\u00e9 du br\u00e9sil"

  test("graft_nfc composes decomposed input and is identity on NFC input") {
    TextExpressions.register(spark)
    import spark.implicits._
    val out = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"))
      .toDF("id", "s")
      .select(col("id"), call_function("graft_nfc", col("s")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == composed, "decomposed form must compose")
    assert(out(2L) == composed, "NFC input must pass through unchanged")
    assert(out(3L) == "plain ascii")
  }

  test("interpreted path matches the JDK normalizer and handles null") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = NfcNormalize(Literal(org.apache.spark.unsafe.types.UTF8String
      .fromString(decomposed)))
    assert(e.eval(null).toString == composed)
    val n = NfcNormalize(Literal.create(null,
      org.apache.spark.sql.types.StringType))
    assert(n.eval(null) == null)
  }

  test("graft_nfc participates in whole-stage codegen and matches the JDK there") {
    TextExpressions.register(spark)
    // range source so the projection isn't constant-folded away from the
    // codegen path; each row carries the decomposed accent.
    val df = spark.range(3)
      .select(concat(lit("cafe\u0301 "), col("id").cast("string")).as("s"))
      .select(call_function("graft_nfc", col("s")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"expected codegen in plan:\n$plan")
    val got = df.orderBy("n").collect().map(_.getString(0))
    val expect = (0 until 3).map(i => java.text.Normalizer.normalize(
      "cafe\u0301 " + i, java.text.Normalizer.Form.NFC))
    assert(got.toSeq == expect)
  }
}
