package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding hot path.
  *
  * The pure-builtin form — `aggregate(zip_with(a, b, (x,y) -> x*y), 0d,
  * (acc,v) -> acc+v)` — is correct but interpreted: higher-order functions
  * are CodegenFallback, so every 64-float dot product pays per-element
  * lambda dispatch and boxing. This expression generates a tight primitive
  * loop inside whole-stage codegen instead (and provides the identical
  * interpreted path for completeness).
  *
  * Floating-point parity: the loop multiplies each float pair widened to
  * double and accumulates left-to-right — the exact operation sequence of
  * the HOF form and of the DuckDB oracle's list comprehension, so results
  * are bit-identical, not just close.
  *
  * Null semantics: a null array yields null (BinaryExpression default);
  * null *elements* are not expected in embedding columns and contribute 0,
  * which is the one intentional divergence from the HOF form (whose sum
  * turns null) — embeddings are non-null float vectors by contract.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  private val dotInfo = new ExpressionInfo(
    classOf[DotProductFloat].getName, "graft_dot")

  private val dotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => DotProductFloat(a, b)
    case other => throw new IllegalArgumentException(
      s"graft_dot expects 2 arguments, got ${other.size}")
  }

  /** Idempotent runtime registration for library callers (the queries call
    * this themselves; no session config needed). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", dotBuilder, "built-in")

  /** `SparkSessionExtensions` hook so a cluster can load the function
    * globally via `spark.sql.extensions=graft.functions.GraftExtensions`. */
  def inject(extensions: SparkSessionExtensions): Unit =
    extensions.injectFunction(
      (FunctionIdentifier("graft_dot"), dotInfo, dotBuilder))
}

/** Entry point for spark.sql.extensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    VectorExpressions.inject(extensions)
}
