package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MULTI-PROBE query-side bucket expansion over [[LshBuckets]]' tables
  * (public multi-probe LSH, Lv et al. 2007, VLDB): for each of the 6
  * tables, emit the query's own sign bucket PLUS the [[LshProbes.Extra]]
  * nearest neighboring buckets — the buckets reached by flipping the
  * planes with the SMALLEST absolute projection margin `|q · w(t,p)|`
  * (ties to the lower plane index). A true neighbor that lands one
  * hair-thin hyperplane away from the query's bucket is recovered
  * without more tables or a bigger index: the INDEX side still stores
  * one bucket per (vector, table) — only probe fan-out grows, 6 → 18
  * bucket reads per query.
  *
  * Output layout: a flat `ARRAY<BIGINT>` of length
  * `NumTables · (1 + Extra)`, table t's probe sequence at positions
  * `[t·(1+Extra), (t+1)·(1+Extra))`, own bucket first, then flips in
  * margin order — so `posexplode` recovers `(t, b)` pairs with
  * `t = pos div (1 + Extra)` and the probe sequence itself is
  * deterministic and oracle-replayable (margins are exact integer
  * dots; the comparison `(|s|, p)` never ties on equal values).
  *
  * Registered as SQL function `graft_lsh_probes` by
  * [[graft.GraftExtensions]].
  */
case class LshProbes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_lsh_probes requires ARRAY<BIGINT> input, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    LshProbes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LshProbes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_lsh_probes"
}

object LshProbes {

  /** Extra probes per table beyond the query's own bucket (single-plane
    * flips by ascending margin). 2 → 3 buckets probed per table. */
  val Extra = 2

  /** Probes per table including the base bucket. */
  val PerTable: Int = 1 + Extra

  import LshBuckets.{Dims, NumTables, PlanesPerTable}

  /** The same weight matrix as [[LshBuckets.compute]] — regenerated here
    * (8 KB of longs) so the two kernels stay independently readable; the
    * formula is pinned by both oracles. */
  private val Weights: Array[Array[Array[Long]]] =
    Array.tabulate(NumTables, PlanesPerTable, Dims)((t, p, d) =>
      (((t * 31 + p) * 97 + d) * 40503L) % 65536L - 32768L)

  def compute(qv: ArrayData): ArrayData = {
    val n = math.min(qv.numElements(), Dims)
    val out = new Array[Long](NumTables * PerTable)
    val acc = new Array[Long](PlanesPerTable)
    var t = 0
    while (t < NumTables) {
      var base = 0L
      var p = 0
      while (p < PlanesPerTable) {
        val w = Weights(t)(p)
        var s = 0L
        var d = 0
        while (d < n) {
          s += qv.getLong(d) * w(d)
          d += 1
        }
        acc(p) = s
        if (s >= 0) base |= (1L << p)
        p += 1
      }
      out(t * PerTable) = base
      // Extra single-plane flips by (|margin|, plane) ascending — exact
      // integer compare; the p tie-break makes the order total
      val sorted = Array.tabulate(PlanesPerTable)(identity)
        .sortBy(p0 => (math.abs(acc(p0)), p0))
      var e = 0
      while (e < Extra) {
        out(t * PerTable + 1 + e) = base ^ (1L << sorted(e))
        e += 1
      }
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
