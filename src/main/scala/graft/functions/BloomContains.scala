package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Probabilistic set membership against a SERIALIZED Bloom filter —
  * `graft_bloom_contains(filter, key)` where `filter` is a foldable
  * BINARY literal holding `org.apache.spark.util.sketch.BloomFilter`
  * bytes (the `writeTo` wire format) and `key` is the BIGINT being
  * probed. Returns false for a NULL key (a NULL never entered the
  * filter — builders drop NULL keys before `putLong`).
  *
  * This is the 100 TB membership-gate primitive: a filter over 10⁹
  * corpus keys at 3% fpp is ~0.9 GB of bits that rides the ONE-PER-STAGE
  * broadcast of the task binary, so "is this delta row's content hash
  * already in the corpus?" becomes a scan-local bit probe with ZERO
  * shuffle — no false negatives (every present key answers true, the
  * sketch contract), so `filter-positives → exact verify join` is
  * semantically identical to the full join while paying join cost only
  * on the tiny maybe-duplicate set. [[graft.operators.CorpusOps
  * .dedupIncrementalBloom]] is the operator built on it.
  *
  * The filter bytes are parsed ONCE per plan instance per JVM
  * (`@transient lazy`), and codegen references the PARSED filter
  * (`BloomFilterImpl` is `Serializable`), so the hot path is a single
  * virtual call per row — no per-row deserialization anywhere.
  */
case class BloomContains(filter: Expression, key: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(filter, key)

  override def checkInputDataTypes(): TypeCheckResult =
    if (filter.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires BINARY filter bytes, got ${filter.dataType.sql}")
    else if (!filter.foldable)
      TypeCheckResult.TypeCheckFailure("graft_bloom_contains filter must be a literal")
    else if (key.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires a BIGINT key, got ${key.dataType.sql}")
    else if (filter.eval() == null)
      TypeCheckResult.TypeCheckFailure("graft_bloom_contains filter bytes are NULL")
    else {
      // parse once at analysis so corrupt bytes fail the QUERY loudly,
      // not each task; the result is cached by the lazy val below
      try { parsed; TypeCheckResult.TypeCheckSuccess }
      catch {
        case e: java.io.IOException =>
          TypeCheckResult.TypeCheckFailure(
            s"graft_bloom_contains filter bytes are not a BloomFilter stream: ${e.getMessage}")
      }
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  @transient private lazy val parsed: BloomFilter =
    BloomFilter.readFrom(filter.eval().asInstanceOf[Array[Byte]])

  override def eval(input: InternalRow): Any = {
    val k = key.eval(input)
    if (k == null) false else parsed.mightContainLong(k.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", parsed, classOf[BloomFilter].getName)
    val k = key.genCode(ctx)
    ev.copy(
      code = code"""
        ${k.code}
        boolean ${ev.value} = ${k.isNull} ? false : $ref.mightContainLong(${k.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(filter = newChildren(0), key = newChildren(1))

  override def prettyName: String = "graft_bloom_contains"
}
