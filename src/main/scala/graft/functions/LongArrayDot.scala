package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.ArrayType
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native dot product of two `ARRAY<BIGINT>` columns.
  *
  * This is the hot loop of every vector operator ([[graft.operators.Dedup]]
  * embedding pairs, [[graft.operators.Similarity]] ANN/kNN): Spark's
  * `aggregate(zip_with(...))` higher-order functions evaluate one Catalyst
  * lambda call per element per row — interpreted, never inside whole-stage
  * codegen. This expression generates a tight primitive `long` loop instead
  * (`doGenCode`), keeping the pairwise-scoring stage inside
  * WholeStageCodegen. Same integer arithmetic, bit-identical results,
  * ~10× less per-pair overhead.
  *
  * Registered as SQL function `graft_dot` by [[GraftExtensions]].
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // manual analysis-time check instead of ExpectsInputTypes
  // (AbstractDataType is sql-private in Spark 4)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(LongType, containsNull = true) ||
      left.dataType == ArrayType(LongType, containsNull = false))
      if (right.dataType == ArrayType(LongType, containsNull = true) ||
        right.dataType == ArrayType(LongType, containsNull = false))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires ARRAY<BIGINT> inputs, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires ARRAY<BIGINT> inputs, got ${left.dataType.sql}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ctx.freshName for every local: two graft_dot calls in one codegen
    // scope (e.g. nq = dot(qv,qv) beside a filter on it) would otherwise
    // emit duplicate `int i` declarations — a Janino "Redefinition of
    // local variable" CompileException and silent interpreted fallback
    val n = ctx.freshName("dotN")
    val acc = ctx.freshName("dotAcc")
    val i = ctx.freshName("dotI")
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |long $acc = 0L;
        |for (int $i = 0; $i < $n; $i++) {
        |  $acc += $a.getLong($i) * $b.getLong($i);
        |}
        |${ev.value} = $acc;
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}
