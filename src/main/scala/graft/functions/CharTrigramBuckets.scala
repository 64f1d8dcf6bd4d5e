package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document char-TRIGRAM md5-bucket census in one pass — the
  * language-ID feature derivation ([[graft.operators.TextAnalysis]]
  * lidFeatures) as a native kernel (r16 verdict #9): for every codepoint
  * trigram of the text, bucket = the top 12 bits of its md5 (exactly
  * `conv(substring(md5(g), 1, 3), 16, 10)` — the first three hex digits),
  * counted per bucket INSIDE the kernel. Output: one packed long per
  * OCCUPIED bucket, `(bucket << 40) | occ`, buckets ascending.
  *
  * Why native: the declarative form exploded one row per corpus
  * CHARACTER (trigram string alloc + md5 + a corpus-sized
  * (doc, bucket) shuffle with map-side partials); this walks the UTF-8
  * byte array once (codepoint boundaries recorded like
  * [[CharGrams]]), md5s each 3-codepoint byte slice in place, and
  * folds counts into a 4096-slot array — the explode that remains is
  * ≤ min(len, 4096) packed longs per doc and the census SHUFFLE
  * disappears entirely (counts are already per-doc-final).
  *
  * Exactness: trigrams are CODEPOINT substrings (UTF8String and DuckDB
  * `substr` agree — the chunk parity rule) and md5 runs over the same
  * UTF-8 bytes `md5()` hashes, so the unpacked (bucket, occ) rows are
  * row-identical to the declarative census (spec-pinned, fuzzed).
  * occ ≤ text length < 2^40 keeps the pack exact.
  *
  * Registered as SQL function `graft_char_trigram_buckets` by
  * [[graft.GraftExtensions]].
  */
case class CharTrigramBuckets(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_char_trigram_buckets requires STRING input, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CharTrigramBuckets.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharTrigramBuckets.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_char_trigram_buckets"
}

object CharTrigramBuckets {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(text: UTF8String): UnsafeArrayData = {
    val bytes = text.getBytes
    // codepoint start offsets (the CharGrams walk): b[i] = byte offset
    // of codepoint i; an extra terminal entry = total length
    val starts = new Array[Int](text.numChars() + 1)
    var i = 0
    var off = 0
    while (off < bytes.length) {
      starts(i) = off
      val b = bytes(off)
      off += (if ((b & 0x80) == 0) 1
              else if ((b & 0xE0) == 0xC0) 2
              else if ((b & 0xF0) == 0xE0) 3
              else 4)
      i += 1
    }
    starts(i) = bytes.length
    val n = i
    if (n < 3) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val counts = new Array[Long](4096)
    val digest = md.get()
    var g = 0
    while (g + 3 <= n) {
      digest.reset()
      digest.update(bytes, starts(g), starts(g + 3) - starts(g))
      val d = digest.digest()
      // top 12 bits = the first three hex digits of the md5 hex string
      val bucket = ((d(0) & 0xFF) << 4) | ((d(1) & 0xFF) >>> 4)
      counts(bucket) += 1L
      g += 1
    }
    var occupied = 0
    var k = 0
    while (k < 4096) { if (counts(k) != 0L) occupied += 1; k += 1 }
    val out = new Array[Long](occupied)
    var j = 0
    k = 0
    while (k < 4096) {
      if (counts(k) != 0L) { out(j) = (k.toLong << 40) | counts(k); j += 1 }
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
