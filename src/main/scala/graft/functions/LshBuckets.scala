package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All 6 LSH table buckets of a quantized vector in one call: bucket `t`
  * is the 4-bit sign pattern of the vector's projections onto that table's
  * 4 deterministic hyperplanes (`weight(t,p,d) = ((t*31+p)*97+d)*40503
  * % 65536 - 32768`, pure integer arithmetic — replayed exactly by the
  * `ann_lsh_topk` DuckDB oracle).
  *
  * Why native: the declarative form was 24 separate `graft_dot` calls
  * against 24 inline 64-element literal arrays — a plan so large Spark
  * truncated its string rendering, re-shipped with every query, and
  * evaluated as 24 separate loops. One static call with the weight matrix
  * as a JVM constant does the same 1536 multiplies in a single pass.
  *
  * Registered as SQL function `graft_lsh_buckets` by
  * [[graft.GraftExtensions]].
  */
case class LshBuckets(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_lsh_buckets requires ARRAY<BIGINT> input, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LshBuckets.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_lsh_buckets"
}

object LshBuckets {

  val NumTables = 6
  val PlanesPerTable = 4
  val Dims = 64

  /** weights(t)(p)(d), identical to the formula in the DuckDB oracle. */
  private val Weights: Array[Array[Array[Long]]] =
    Array.tabulate(NumTables, PlanesPerTable, Dims)((t, p, d) =>
      (((t * 31 + p) * 97 + d) * 40503L) % 65536L - 32768L)

  /** 6 bucket values (one per table); truncated vectors use the common
    * prefix, matching graft_dot's convention. */
  def compute(qv: ArrayData): ArrayData = {
    val n = math.min(qv.numElements(), Dims)
    val out = new Array[Long](NumTables)
    var t = 0
    while (t < NumTables) {
      var b = 0L
      var p = 0
      while (p < PlanesPerTable) {
        val w = Weights(t)(p)
        var acc = 0L
        var d = 0
        while (d < n) {
          acc += qv.getLong(d) * w(d)
          d += 1
        }
        if (acc >= 0) b |= (1L << p)
        p += 1
      }
      out(t) = b
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
