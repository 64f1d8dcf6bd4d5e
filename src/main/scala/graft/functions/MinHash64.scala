package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-permutation MinHash signature of a whitespace-tokenized text column
  * over word-3-gram shingles, in one pass.
  *
  * Replaces the round-1 pipeline (split → shingle transform → explode →
  * distinct → 64-expression groupBy aggregate: two shuffles plus a
  * 64-wide generated aggregate) with a single narrow expression — one JVM
  * static call from generated code per row, zero shuffle, scan-speed.
  *
  * Permutation family: each shingle gets a 64-bit base hash (FNV-1a word
  * hashes mixed pairwise through a murmur-style finalizer), and permutation
  * `i` is `fmix64(base ^ SEED(i))` with 64 independently avalanched seed
  * constants. Each permutation is a full-diffusion bijection of the shingle
  * space — NOT the Kirsch–Mitzenmacher `h1 + i·h2` shortcut, whose
  * correlated components collapse LSH band diversity (tried in round 1 and
  * reverted; see Dedup scaladoc).
  *
  * Duplicate shingles need no dedup: `min` is multiset-invariant.
  * Returns NULL for texts with fewer than 3 words (no shingles).
  *
  * Registered as SQL function `graft_minhash` by [[graft.GraftExtensions]].
  */
case class MinHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_minhash requires STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultVar = ctx.freshName("minhashResult")
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"""
        |ArrayData $resultVar = graft.functions.MinHash64.compute($c);
        |if ($resultVar == null) {
        |  ${ev.isNull} = true;
        |} else {
        |  ${ev.value} = $resultVar;
        |}
      """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}

object MinHash64 {

  val NumPerms = 64

  /** Murmur3/xxhash-style 64-bit finalizer: full avalanche, bijective. */
  @inline private[functions] def fmix64(x: Long): Long = {
    var h = x
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** Independently avalanched per-permutation seed constants
    * (package-visible: [[graft.operators.Dedup.minhashSql]] embeds them
    * as literals so the oracle's permutations can never drift from the
    * kernel's). */
  private[graft] val Seeds: Array[Long] =
    Array.tabulate(NumPerms)(i => fmix64(0x9e3779b97f4a7c15L * (i + 1)))

  private[functions] def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  @inline private[functions] def mix2(a: Long, b: Long): Long =
    fmix64(a * 0x9e3779b97f4a7c15L + b)

  /** One-pass signature: tokenize, roll a 3-word-hash window, and for each
    * shingle update 64 running minima. Returns null when < 3 words. */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val mins = new Array[Long](NumPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    // rolling window of the last three word hashes
    var w1 = 0L; var w2 = 0L; var w3 = 0L
    var nWords = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        if (i > start) {
          w1 = w2; w2 = w3; w3 = fnv1a(bytes, start, i)
          nWords += 1
          if (nWords >= 3) {
            val base = mix2(mix2(w1, w2), w3)
            var p = 0
            while (p < NumPerms) {
              val v = fmix64(base ^ Seeds(p))
              if (v < mins(p)) mins(p) = v
              p += 1
            }
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (nWords < 3) null else UnsafeArrayData.fromPrimitiveArray(mins)
  }
}
