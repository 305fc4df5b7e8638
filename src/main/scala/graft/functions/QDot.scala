package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: exact BIGINT dot product of two
  * `ARRAY<BIGINT>` columns — `qdot_native(a, b)` after registration via
  * [[graft.Sessions]]' `SparkSessionExtensions.injectFunction`.
  *
  * This is the preferred extension route when built-ins run out
  * (SURVEY.md §7.3): a real `Expression` with `doGenCode`, so the dot
  * product compiles into the surrounding whole-stage-codegen'd loop as
  * a tight `long` for-loop over the two `ArrayData` — no per-element
  * lambda dispatch (the `aggregate`/`zip_with` higher-order functions
  * are interpreted per row) and no 64-term unrolled expression tree
  * (which costs Catalyst-transform time on every execution,
  * [[Fns.qdotStatic]]). Semantics identical to [[Fns.qdot]]: pairwise
  * products summed left-to-right in Long arithmetic (exact,
  * overflow-free for 1e-6-quantized unit-scale vectors), length =
  * min(|a|, |b|); null if either array is null, and — matching the
  * higher-order-function form's null propagation — null if any
  * compared element is null (quantized vectors never are, but the
  * function is registered session-wide and must not read a null slot
  * as garbage).
  */
case class QDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qdot_native requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = LongType

  /** Always nullable: a null ELEMENT nulls the result even when both
    * array columns are non-nullable (and nullSafeCodeGen only emits a
    * mutable isNull when the expression declares itself nullable). */
  override def nullable: Boolean = true

  override def prettyName: String = "qdot_native"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QDot =
    copy(left = newLeft, right = newRight)
}
