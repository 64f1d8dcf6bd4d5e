package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-3-gram shingle hashes of a whitespace-tokenized text
  * column, in one pass — the candidate-generation key array for exact
  * n-gram Jaccard ([[graft.operators.Dedup.ngramJaccard]]).
  *
  * Why native: the declarative form (`array_distinct(transform(sequence,
  * i -> xxhash64(element_at(w, i)...)))` over an aliased `split`) is a trap
  * — Catalyst's projection collapsing inlines the `split` alias into every
  * `element_at` site inside the lambda, so tokenization re-executes per
  * gram element: O(words²) per document, interpreted. Measured 2.5× SLOWER
  * than round 1's explode pipeline at sf0.1. This expression tokenizes
  * once, rolls a 3-word hash window (same FNV-1a + murmur-finalizer family
  * as [[MinHash64]]), and sort-dedups in place: one static call from
  * generated code, zero shuffle, scan-speed.
  *
  * Gram identity is the 64-bit mixed hash, not the string: an 8-byte join
  * key, no string concat; a collision needs two distinct grams with equal
  * 64-bit hashes among ~10^5 grams (P ≈ 1e-11).
  *
  * Returns NULL for texts with fewer than 3 words (no shingles).
  * Registered as SQL function `graft_grams` by [[graft.GraftExtensions]].
  */
case class GramHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_grams requires STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    GramHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultVar = ctx.freshName("gramsResult")
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"""
        |ArrayData $resultVar = graft.functions.GramHash64.compute($c);
        |if ($resultVar == null) {
        |  ${ev.isNull} = true;
        |} else {
        |  ${ev.value} = $resultVar;
        |}
      """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_grams"
}

/** Rolling word-3-gram shingle hashes IN DOCUMENT ORDER, duplicates
  * kept — element i is the shingle starting at word i (0-based), so the
  * array index IS the word position. The positional sibling of
  * [[GramHash64]] (same tokenization, same hash family — the two join
  * against each other), powering span reporting in
  * [[graft.operators.CorpusOps.contamination]]: where the distinct
  * variant answers "how much overlaps", this answers "WHERE it
  * overlaps". One pass, one static call from generated code; NULL for
  * texts with fewer than 3 words.
  *
  * Registered as SQL function `graft_grams_roll` by
  * [[graft.GraftExtensions]].
  */
case class RollGrams64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_grams_roll requires STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    GramHash64.rolling(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultVar = ctx.freshName("rollResult")
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"""
        |ArrayData $resultVar = graft.functions.GramHash64.rolling($c);
        |if ($resultVar == null) {
        |  ${ev.isNull} = true;
        |} else {
        |  ${ev.value} = $resultVar;
        |}
      """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_grams_roll"
}

/** Winnowing fingerprint of a text column: the distinct minima of every
  * window of 8 consecutive rolling 3-word-gram hashes — the classic
  * rolling-hash document fingerprint (any shared run of ≥ 10 words between
  * two documents is guaranteed a shared fingerprint element). One pass,
  * one static call from generated code; declaring this with
  * `transform(sequence(...), i -> array_min(slice(garr, ...)))` would
  * re-evaluate the gram scan per window via projection collapsing (the
  * same trap [[GramHash64]]'s scaladoc documents).
  *
  * Registered as SQL function `graft_winnow` by [[graft.GraftExtensions]].
  */
case class Winnow64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_winnow requires STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    GramHash64.winnow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultVar = ctx.freshName("winnowResult")
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"""
        |ArrayData $resultVar = graft.functions.GramHash64.winnow($c);
        |if ($resultVar == null) {
        |  ${ev.isNull} = true;
        |} else {
        |  ${ev.value} = $resultVar;
        |}
      """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow"
}

object GramHash64 {

  import MinHash64.{fnv1a, mix2}

  val WinnowWindow = 8

  /** Rolling gram hashes in document order (duplicates kept). Null-length
    * (< 3 words) yields an empty array. */
  private def rollingGrams(bytes: Array[Byte]): Array[Long] = {
    val n = bytes.length
    var grams = new Array[Long](math.max(8, n / 8))
    var nGrams = 0
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
            if (nGrams == grams.length) grams = java.util.Arrays.copyOf(grams, nGrams * 2)
            grams(nGrams) = mix2(mix2(w1, w2), w3)
            nGrams += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    java.util.Arrays.copyOf(grams, nGrams)
  }

  /** Rolling gram hashes in document order (see [[RollGrams64]]).
    * Null if the text has no 3-gram shingles. */
  def rolling(text: UTF8String): ArrayData = {
    val grams = rollingGrams(text.getBytes)
    if (grams.length == 0) null else UnsafeArrayData.fromPrimitiveArray(grams)
  }

  /** Winnowing: distinct minima of every [[WinnowWindow]]-gram window,
    * sorted ascending. Null if the text has no 3-gram shingles. */
  def winnow(text: UTF8String): ArrayData = {
    val grams = rollingGrams(text.getBytes)
    if (grams.length == 0) return null
    val w = WinnowWindow
    val nWindows = math.max(grams.length - w + 1, 1)
    val mins = new Array[Long](nWindows)
    var i = 0
    while (i < nWindows) {
      var m = Long.MaxValue
      var j = i
      val end = math.min(i + w, grams.length)
      while (j < end) { if (grams(j) < m) m = grams(j); j += 1 }
      mins(i) = m
      i += 1
    }
    java.util.Arrays.sort(mins)
    var out = 1
    i = 1
    while (i < nWindows) {
      if (mins(i) != mins(out - 1)) { mins(out) = mins(i); out += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(mins, out))
  }

  /** One-pass distinct 3-gram hashes (sorted ascending). Null if < 3 words.
    * Tokenization = non-empty space-separated runs (consecutive/leading/
    * trailing spaces produce no empty tokens); the SQL oracles collapse
    * whitespace before splitting so both engines shingle the same token
    * sequence. */
  def compute(text: UTF8String): ArrayData = {
    val grams = rollingGrams(text.getBytes)
    val nGrams = grams.length
    if (nGrams == 0) return null
    java.util.Arrays.sort(grams)
    // in-place dedup of the sorted array
    var out = 1
    var i = 1
    while (i < nGrams) {
      if (grams(i) != grams(out - 1)) { grams(out) = grams(i); out += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(grams, out))
  }
}
