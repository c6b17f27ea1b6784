package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Native Catalyst expression: forward sliding-window minimum over an
  * `array<string>` — `out(i) = min(arr(i .. i+w-1))` with the window
  * truncating at the end of the array (the winnowing fingerprint
  * shape, equivalent to `min(...) OVER (ROWS BETWEEN CURRENT ROW AND
  * w-1 FOLLOWING)` per document).
  *
  * Why a custom Expression (preference order (b) of the build rules):
  * the composable form — `transform(sequence(0, n-1), i ->
  * array_min(slice(arr, i+1, w)))` — re-slices and re-scans w elements
  * per position: O(n*w) work and O(n*w) allocation per document. This
  * kernel keeps a monotonic deque of candidate indices instead, O(n)
  * amortized with a single output allocation, and emits one fused loop
  * under whole-stage codegen. A corpus-scale fingerprint pass runs
  * this per document, so the asymptotic gap is the difference between
  * the hash pass and the minima pass dominating.
  *
  * Null semantics match the composable path: null array -> null; null
  * ELEMENTS are skipped (`array_min` ignores nulls), and a window of
  * only nulls yields a null entry.
  */
case class SlidingMin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        val w = right.eval().asInstanceOf[Int]
        if (w >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"sliding_min window must be >= 1, got $w")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sliding_min expects (array<string>, foldable int), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true

  private lazy val window: Int = right.eval().asInstanceOf[Int]

  override def nullSafeEval(arr: Any, w: Any): Any = {
    val in = arr.asInstanceOf[ArrayData]
    val n = in.numElements()
    val win = w.asInstanceOf[Int]
    val vals = new Array[UTF8String](n)
    var i = 0
    while (i < n) { if (!in.isNullAt(i)) vals(i) = in.getUTF8String(i); i += 1 }
    val out = new Array[Any](n)
    val dq = new Array[Int](math.max(n, 1))
    var head = 0
    var tail = -1 // deque empty; vals(dq(head)) is the current window min
    i = n - 1
    while (i >= 0) {
      if (vals(i) != null) {
        // i dominates every queued j > i with a >= value: i is in every
        // remaining window that contains j
        while (tail >= head && vals(dq(tail)).compareTo(vals(i)) >= 0) tail -= 1
        tail += 1
        dq(tail) = i
      }
      // evict candidates that slid out of [i, i+w-1]
      while (head <= tail && dq(head) > i + win - 1) head += 1
      out(i) = if (head <= tail) vals(dq(head)) else null
      i -= 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, w) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val vals = ctx.freshName("vals")
      val out = ctx.freshName("out")
      val dq = ctx.freshName("dq")
      val head = ctx.freshName("head")
      val tail = ctx.freshName("tail")
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $x.numElements();
         |$utf8[] $vals = new $utf8[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) $vals[$i] = $x.getUTF8String($i);
         |}
         |Object[] $out = new Object[$n];
         |int[] $dq = new int[$n > 0 ? $n : 1];
         |int $head = 0; int $tail = -1;
         |for (int $i = $n - 1; $i >= 0; $i--) {
         |  if ($vals[$i] != null) {
         |    while ($tail >= $head && $vals[$dq[$tail]].compareTo($vals[$i]) >= 0) $tail--;
         |    $dq[++$tail] = $i;
         |  }
         |  while ($head <= $tail && $dq[$head] > $i + $w - 1) $head++;
         |  $out[$i] = ($head <= $tail) ? $vals[$dq[$head]] : null;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SlidingMin =
    copy(left = newLeft, right = newRight)
}

object SlidingMin {
  /** Column-level entry point for the fused kernel. */
  def sliding_min(arr: Column, window: Int): Column =
    Bridge.column(SlidingMin(Bridge.expression(arr), Literal(window)))
}
