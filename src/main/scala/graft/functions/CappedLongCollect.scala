package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `graft_collect_capped(x, cap)` — collect BIGINT values into a sorted
  * array, but give up (return NULL) the moment a group exceeds `cap`
  * elements. The missing primitive behind the dedup hot-key guards:
  *
  * The rare-gram pipelines need per-gram doc lists ONLY for grams with
  * df ≤ 20 — but `collect_list` must buffer EVERY occurrence before a
  * size filter can run, so a corpus-wide stop-shingle with df = 10⁸
  * builds a 10⁸-element buffer that is then thrown away. Rounds 4-6
  * avoided that with a count → rare-filter → semi-join → collect chain,
  * which plan probing showed costs a second corpus scan and ships every
  * hot-gram occurrence to a single reducer before dropping it. This
  * aggregate deletes the whole chain: aggregation state is AT MOST
  * cap+1 longs per group no matter how hot the key, it combines
  * map-side (partial buffers cap at the same bound, so a df=10⁸ gram
  * crosses the wire as ≤ cap+1 longs per map task), and groups over the
  * cap evaluate to NULL — exactly the rows the df filter drops anyway.
  *
  * Output contract: NULL for groups with > cap collected values (or
  * with no non-null input); otherwise the values sorted ascending —
  * callers pair-expand sorted buckets, so the sort is folded in here.
  * NULL inputs are skipped like any SQL aggregate.
  *
  * Registered by [[graft.GraftExtensions]]; `cap` must be a foldable
  * positive integer literal.
  */
case class CappedLongCollect(
    child: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedLongCollect.Buf]
    with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = capExpr

  private lazy val cap: Int = capExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BIGINT input, got ${child.dataType.sql}")
    else if (!capExpr.foldable ||
      !(capExpr.dataType == IntegerType || capExpr.dataType == LongType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName cap must be an integer literal")
    else if (capExpr.eval() == null || capExpr.eval().asInstanceOf[Number].longValue() < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName cap must be positive")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def createAggregationBuffer(): CappedLongCollect.Buf =
    new CappedLongCollect.Buf(Array.emptyLongArray, 0)

  /** Append one value; past the cap only the overflow mark (n = cap+1)
    * is kept, so buffer memory is bounded by cap+1 longs forever. */
  private def append(b: CappedLongCollect.Buf, v: Long): Unit =
    if (b.n <= cap) {
      if (b.n == cap) b.n = cap + 1 // overflow: stop storing
      else {
        if (b.n == b.arr.length)
          b.arr = java.util.Arrays.copyOf(b.arr, math.max(4, math.min(cap, b.arr.length * 2)))
        b.arr(b.n) = v
        b.n += 1
      }
    }

  override def update(b: CappedLongCollect.Buf, input: InternalRow): CappedLongCollect.Buf = {
    val v = child.eval(input)
    if (v != null) append(b, v.asInstanceOf[Long])
    b
  }

  override def merge(b: CappedLongCollect.Buf, o: CappedLongCollect.Buf): CappedLongCollect.Buf = {
    if (o.n > cap) b.n = cap + 1
    else {
      var i = 0
      while (i < o.n && b.n <= cap) { append(b, o.arr(i)); i += 1 }
    }
    b
  }

  override def eval(b: CappedLongCollect.Buf): Any =
    if (b.n == 0 || b.n > cap) null
    else {
      val out = java.util.Arrays.copyOf(b.arr, b.n)
      java.util.Arrays.sort(out)
      new GenericArrayData(out)
    }

  override def serialize(b: CappedLongCollect.Buf): Array[Byte] = {
    // an overflowed buffer's contents are dead (eval is NULL): ship only
    // the mark — arr may legitimately be shorter than cap when the
    // overflow arrived via merge rather than append
    val n = if (b.n > cap) 0 else b.n
    val bb = ByteBuffer.allocate(4 + 8 * n)
    bb.putInt(b.n)
    var i = 0
    while (i < n) { bb.putLong(b.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedLongCollect.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val stored = (bytes.length - 4) / 8
    val arr = new Array[Long](stored)
    var i = 0
    while (i < stored) { arr(i) = bb.getLong; i += 1 }
    new CappedLongCollect.Buf(arr, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedLongCollect =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CappedLongCollect =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression =
    copy(child = newLeft, capExpr = newRight)

  override def prettyName: String = "graft_collect_capped"
}

object CappedLongCollect {
  /** Mutable aggregation state: `arr[0, min(n, cap))` holds collected
    * values; `n > cap` marks overflow (contents then irrelevant). */
  final class Buf(var arr: Array[Long], var n: Int)
}
