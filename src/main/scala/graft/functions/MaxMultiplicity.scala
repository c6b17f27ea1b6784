package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Native Catalyst expression: the multiplicity of the most frequent
  * element of an `array<string>` — the Gopher-style repetition gate's
  * "occurrences of the top n-gram" count.
  *
  * Why a custom Expression (preference order (b) of the build rules):
  * the composable forms are either `transform(array_distinct(a), d ->
  * size(filter(a, x -> x = d)))` — O(n * distinct) rescans and one
  * array allocation per distinct element — or a sort + `aggregate`
  * fold whose per-element struct accumulator runs interpreted. This
  * kernel sorts a scratch copy and scans runs once: O(n log n), two
  * allocations, one fused loop under whole-stage codegen.
  *
  * Null semantics: null array -> null; null ELEMENTS are skipped (the
  * filter-count form never matches them); an empty or all-null array
  * yields 0.
  */
case class MaxMultiplicity(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"max_multiplicity expects array<string>, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(arr: Any): Any = {
    val in = arr.asInstanceOf[ArrayData]
    val n = in.numElements()
    val vals = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!in.isNullAt(i)) { vals(m) = in.getUTF8String(i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(vals.asInstanceOf[Array[Object]], 0, m)
    var best = 0L
    var run = 0L
    i = 0
    while (i < m) {
      run = if (i > 0 && vals(i).equals(vals(i - 1))) run + 1L else 1L
      if (run > best) best = run
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val vals = ctx.freshName("vals")
      val best = ctx.freshName("best")
      val run = ctx.freshName("run")
      val utf8 = classOf[UTF8String].getName
      s"""
         |int $n = $x.numElements();
         |$utf8[] $vals = new $utf8[$n];
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) $vals[$m++] = $x.getUTF8String($i);
         |}
         |java.util.Arrays.sort($vals, 0, $m);
         |long $best = 0L; long $run = 0L;
         |for (int $i = 0; $i < $m; $i++) {
         |  $run = ($i > 0 && $vals[$i].equals($vals[$i - 1])) ? $run + 1L : 1L;
         |  if ($run > $best) $best = $run;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MaxMultiplicity =
    copy(child = newChild)
}

object MaxMultiplicity {
  /** Column-level entry point for the fused kernel. */
  def max_multiplicity(arr: Column): Column =
    Bridge.column(MaxMultiplicity(Bridge.expression(arr)))
}
