package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-array dot product — the one
  * hot scalar path where the built-in surface falls short: higher-order
  * functions (`aggregate(zip_with(...))`) interpret their lambdas per
  * row outside whole-stage codegen, which matters when every (query,
  * candidate) pair evaluates a 64-element fold. This compiles to a tight
  * primitive loop inside generated code.
  *
  * Semantics are IDENTICAL to the fold it replaces (and to DuckDB's
  * `list_reduce`): left-to-right double accumulation over index-paired
  * float products, so oracle hash parity is unaffected.
  */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<float> arguments, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  val Name = "graft_dot"

  /** Register `graft_dot` on the session (idempotent). Done per session
    * rather than via `spark.sql.extensions` because the driver harness
    * builds plain sessions; an extensions-based deployment would call
    * `injectFunction` with the same builder.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, (exprs: Seq[Expression]) => DotProductExpr(exprs(0), exprs(1)), "built-in")

  /** Column form; requires `register(spark)` on the owning session. */
  def apply(a: Column, b: Column): Column = call_function(Name, a, b)
}
