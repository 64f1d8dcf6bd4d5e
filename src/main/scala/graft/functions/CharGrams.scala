package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character-L-grams of a text column, in one pass — the
  * candidate array for the exact substring-span duplication census
  * ([[graft.operators.TextAnalysis.spanDup]]).
  *
  * Why native (the [[GramHash64]] lesson, re-measured here): the
  * declarative forms both lose —
  *   - `explode(sequence) + substring(text, i, L)` is codegen'd but
  *     produces corpus-wide duplicate rows that only a full
  *     (doc_id, gram) DISTINCT shuffle can clear: 1.4M 32-char strings
  *     hashed twice and exchanged, measured 1.1s of a 2.3s query at
  *     sf0.1 — for within-doc duplicates that are < 1% of rows;
  *   - `array_distinct(transform(sequence, i -> substring(...)))`
  *     evaluates the lambda INTERPRETED per element and re-executes per
  *     consumer, measured 3.4s for the df census alone.
  * This expression walks the UTF-8 byte array once, records codepoint
  * boundaries, slices each L-gram without re-seeking, and dedups via an
  * insertion-ordered hash set: one static call from generated code, no
  * shuffle, scan-speed. Gram identity is the STRING itself (not a
  * hash): the census is hash-checked cell-exact against DuckDB, so
  * collisions are not acceptable — the 8-byte-hash variant is the
  * declared 100 TB form where the oracle no longer watches.
  *
  * Characters are Unicode codepoints (UTF8String's and DuckDB
  * `substr`'s shared convention). Returns NULL for texts shorter than
  * L characters (no grams). Registered as SQL function
  * `graft_char_grams(text, L)` by [[graft.GraftExtensions]].
  */
case class CharGrams(child: Expression, gramLen: Expression) extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = gramLen

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_char_grams requires STRING text, got ${child.dataType.sql}")
    else if (gramLen.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_char_grams requires INT gram length, got ${gramLen.dataType.sql}")
    else if (!gramLen.foldable)
      TypeCheckResult.TypeCheckFailure("graft_char_grams gram length must be a literal")
    else {
      val l = gramLen.eval()
      if (l == null || l.asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure(
          s"graft_char_grams gram length must be a positive literal, got $l")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(text: Any, l: Any): Any =
    CharGrams.compute(text.asInstanceOf[UTF8String], l.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultVar = ctx.freshName("charGramsResult")
    nullSafeCodeGen(
      ctx,
      ev,
      (t, l) => s"""
        |ArrayData $resultVar = graft.functions.CharGrams.compute($t, $l);
        |if ($resultVar == null) {
        |  ${ev.isNull} = true;
        |} else {
        |  ${ev.value} = $resultVar;
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression =
    copy(child = newLeft, gramLen = newRight)

  override def prettyName: String = "graft_char_grams"
}

/** Distinct 64-bit HASHES of character-L-grams at a sampling stride —
  * the 100 TB representation of [[CharGrams]]: 8-byte join keys instead
  * of L-char strings (4-8× narrower shuffles/caches) and a stride that
  * divides the gram count, at the price of hash-collision risk
  * (P ≈ n²/2⁶⁵ — ~10⁻⁸ at a million grams, the ngram-pipeline
  * precedent) and stride-quantized span boundaries. Same one-pass
  * codepoint walk as [[CharGrams]]; hashes are FNV-1a over the gram's
  * bytes through the murmur finalizer ([[MinHash64]]'s family).
  * Returns NULL below L characters. Registered as
  * `graft_char_grams_hash(text, L, stride)`. */
case class CharGramsHash(child: Expression, gramLen: Expression, stride: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = child
  override def second: Expression = gramLen
  override def third: Expression = stride

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_char_grams_hash requires STRING text, got ${child.dataType.sql}")
    else if (gramLen.dataType != IntegerType || stride.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("graft_char_grams_hash requires INT length and stride")
    else if (!gramLen.foldable || !stride.foldable)
      TypeCheckResult.TypeCheckFailure("graft_char_grams_hash length and stride must be literals")
    else {
      val l = gramLen.eval()
      val st = stride.eval()
      if (l == null || l.asInstanceOf[Int] < 1 || st == null || st.asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure(
          s"graft_char_grams_hash length/stride must be positive literals, got $l/$st")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(text: Any, l: Any, st: Any): Any =
    CharGrams.computeHashed(
      text.asInstanceOf[UTF8String],
      l.asInstanceOf[Int],
      st.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultVar = ctx.freshName("charGramsHashResult")
    nullSafeCodeGen(
      ctx,
      ev,
      (t, l, st) => s"""
        |ArrayData $resultVar = graft.functions.CharGrams.computeHashed($t, $l, $st);
        |if ($resultVar == null) {
        |  ${ev.isNull} = true;
        |} else {
        |  ${ev.value} = $resultVar;
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression): Expression =
    copy(child = newFirst, gramLen = newSecond, stride = newThird)

  override def prettyName: String = "graft_char_grams_hash"
}

object CharGrams {

  /** Distinct char-L-grams in first-occurrence order; null if the text
    * has fewer than L characters. */
  def compute(text: UTF8String, l: Int): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    // codepoint boundary byte-offsets in one pass: a byte starts a
    // character iff it is not a UTF-8 continuation byte (10xxxxxx)
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      if ((bytes(i) & 0xC0) != 0x80) nChars += 1
      i += 1
    }
    if (nChars < l) return null
    val offs = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < nBytes) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(c) = i; c += 1 }
      i += 1
    }
    offs(nChars) = nBytes
    val nGrams = nChars - l + 1
    // capacity hint capped: nGrams * 2 would wrap negative for a >1 GiB
    // single document (within UTF8String's 2 GB bound) and HashSet
    // throws on negative capacity
    val seen = new java.util.HashSet[UTF8String](math.min(nGrams.toLong * 2, 1 << 26).toInt)
    // same cap for the list: an eager nGrams-sized reference array is
    // ~8 GB for a 1 GiB doc even when distinct grams are few
    val out = new java.util.ArrayList[UTF8String](math.min(nGrams.toLong, 1 << 20).toInt)
    var g = 0
    while (g < nGrams) {
      val gram = UTF8String.fromBytes(bytes, offs(g), offs(g + l) - offs(g))
      if (seen.add(gram)) out.add(gram)
      g += 1
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size)))
  }

  /** Distinct char-L-gram HASHES at `stride` (positions 0, stride, 2·stride,
    * … in char index), sorted ascending; null below L characters. */
  def computeHashed(text: UTF8String, l: Int, stride: Int): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      if ((bytes(i) & 0xC0) != 0x80) nChars += 1
      i += 1
    }
    if (nChars < l) return null
    val offs = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < nBytes) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(c) = i; c += 1 }
      i += 1
    }
    offs(nChars) = nBytes
    val nPos = (nChars - l) / stride + 1
    val hs = new Array[Long](nPos)
    var p = 0
    while (p < nPos) {
      val g = p * stride
      hs(p) = MinHash64.mix2(0L, MinHash64.fnv1a(bytes, offs(g), offs(g + l)))
      p += 1
    }
    java.util.Arrays.sort(hs)
    var out = 1
    i = 1
    while (i < nPos) {
      if (hs(i) != hs(out - 1)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(hs, out))
  }
}
