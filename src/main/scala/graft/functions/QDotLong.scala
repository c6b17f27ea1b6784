package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.graftbridge.Bridge

/** Native Catalyst expression: exact integer dot product of two
  * `array<bigint>` (quantized) vectors, one fused loop under
  * whole-stage codegen.
  *
  * Why a custom Expression (preference order (b) of the build rules):
  * the composable `aggregate(zip_with(a, b, *), ...)` form
  * materializes the product array and walks it again per pair. The
  * LSH-verify and ANN stages evaluate this kernel once per candidate
  * pair — O(candidates x dim) executions — so the fused loop is the
  * hot-path version, exactly as CosineSimilarity is for the float
  * path. Integer addition is order-insensitive, so the result is
  * bit-identical to the composable form and to a DuckDB oracle that
  * SUMs position-joined components.
  *
  * Null semantics match the composable path: null input or
  * length-mismatched inputs -> null; a null ELEMENT poisons the sum ->
  * null (zip_with products propagate null through the fold).
  */
case class QDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qdot expects two array<bigint> inputs, got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $x.getLong($i) * $y.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QDotLong =
    copy(left = newLeft, right = newRight)
}

object QDotLong {
  /** Column-level entry point for the fused kernel. */
  def qdot_fast(a: Column, b: Column): Column =
    Bridge.column(QDotLong(Bridge.expression(a), Bridge.expression(b)))
}
