package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) tokenization to id arrays in ONE
  * native pass — `graft_unigram_ids(text, pieces, costs)` where the two
  * tail arguments are foldable literal arrays describing the learned
  * vocabulary: `pieces` in the caller's id order (id = array index) and
  * `costs` the aligned integer micro-nat costs (−ln p(piece) · 10⁶).
  *
  * Exists for the same whole-stage-codegen reason as [[BpeIds]]: the
  * per-word VITERBI segmentation (exact min-cost split of each word into
  * vocabulary pieces) has no tractable declarative rendering at corpus
  * scale, so it runs as one JVM static call per row with the vocabulary
  * pre-parsed ONCE per plan into a hash map.
  *
  * Semantics (pinned by the spec's plain-Scala reference and the DuckDB
  * fold rendering in [[graft.operators.TextAnalysis]]'s unigram
  * oracles):
  *
  *  - split on single spaces, empties dropped; symbols are CODE POINTS
  *    ([[BpeIds]]' fit/apply-consistency rule);
  *  - per word, forward DP over code-point positions with piece length
  *    1..[[UnigramIds.PieceMax]]: dp(k) = min over p of
  *    dp(k−p) + cost(piece); an UNKNOWN single code point costs
  *    [[UnigramIds.UnkCostMicro]] (finite, so segmentation never
  *    fails); unknown longer pieces are impossible splits;
  *  - backtrack from the word end preferring the LONGEST piece that
  *    achieves the minimum at each step — the deterministic tie rule
  *    both engines share;
  *  - ids are indices into `pieces`; an unknown single code point
  *    emits −1 (the UNK id). NULL text → empty array, never NULL.
  */
case class UnigramIds(text: Expression, pieces: Expression, costs: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(text, pieces, costs)

  override def checkInputDataTypes(): TypeCheckResult = {
    val strArr = pieces.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    val longArr = costs.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_unigram_ids requires STRING text, got ${text.dataType.sql}")
    else if (!strArr || !longArr)
      TypeCheckResult.TypeCheckFailure(
        "graft_unigram_ids requires (text STRING, pieces ARRAY<STRING>, costs ARRAY<BIGINT>)")
    else if (!pieces.foldable || !costs.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_unigram_ids vocabulary arguments must be literals")
    else {
      // reject NULL tables / NULL elements before the once-per-plan parse
      // would NPE ([[BpeIds]]' diagnosable-message rule)
      val nullWhere = Seq("pieces" -> pieces, "costs" -> costs).collectFirst {
        case (name, e) if e.eval() == null => s"$name is NULL"
        case (name, e)
            if {
              val a = e.eval().asInstanceOf[ArrayData]
              (0 until a.numElements()).exists(a.isNullAt)
            } =>
          s"$name contains a NULL element"
      }
      nullWhere
        .map(w => TypeCheckResult.TypeCheckFailure(s"graft_unigram_ids vocabulary: $w"))
        .getOrElse {
          val np = pieces.eval().asInstanceOf[ArrayData].numElements()
          val nc = costs.eval().asInstanceOf[ArrayData].numElements()
          if (np != nc)
            TypeCheckResult.TypeCheckFailure(
              s"graft_unigram_ids vocabulary arrays disagree: $np pieces vs $nc costs")
          else TypeCheckResult.TypeCheckSuccess
        }
    }
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  @transient private lazy val table: UnigramIds.Table = {
    val p = pieces.eval().asInstanceOf[ArrayData]
    val c = costs.eval().asInstanceOf[ArrayData]
    new UnigramIds.Table(
      Array.tabulate(p.numElements())(i => p.getUTF8String(i).toString),
      Array.tabulate(c.numElements())(i => c.getLong(i)))
  }

  override def eval(input: InternalRow): Any =
    UnigramIds.tokenize(text.eval(input).asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("unigramTable", table, classOf[UnigramIds.Table].getName)
    val c = text.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.UnigramIds.tokenize(${c.isNull} ? null : ${c.value}, $tRef);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), pieces = newChildren(1), costs = newChildren(2))

  override def prettyName: String = "graft_unigram_ids"
}

object UnigramIds {

  /** Longest piece in code points — fixed across fit, apply and both
    * oracles (a knob here would silently desynchronize the learned
    * vocabulary from the segmenter). */
  val PieceMax = 4

  /** Cost of an UNKNOWN single code point, micro-nats: far above any
    * learnable piece cost (−ln of a 1-count piece in a 2⁵³-total census
    * is ≈ 36.7e6) yet small enough that dp sums stay exact longs. */
  val UnkCostMicro = 40000000L

  /** Pre-parsed vocabulary: piece → (id, cost). */
  final class Table(val pieceArr: Array[String], val costArr: Array[Long])
      extends Serializable {
    require(pieceArr.length == costArr.length,
      s"vocabulary arrays disagree: ${pieceArr.length}/${costArr.length}")
    // BOXED values ([[BpeIds]]' convention): a `HashMap[String, Int]`
    // would unbox a missing key's null to 0 and silently resolve every
    // unknown piece to vocabulary entry 0
    val lookup: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      var i = 0
      while (i < pieceArr.length) {
        // first occurrence wins — a well-formed table has no duplicates
        if (!m.containsKey(pieceArr(i))) m.put(pieceArr(i), i)
        i += 1
      }
      m
    }
  }

  def tokenize(text: UTF8String, t: Table): ArrayData = {
    val s = if (text == null) "" else text.toString
    val out = new java.util.ArrayList[Any]()
    var wStart = 0
    val n = s.length
    var pos = 0
    while (pos <= n) {
      if (pos == n || s.charAt(pos) == ' ') {
        if (pos > wStart) segmentWord(s.substring(wStart, pos), t, out)
        wStart = pos + 1
      }
      pos += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Viterbi over one word's code points; see the expression scaladoc
    * for the tie rule. Shared with the driver-side FIT's E-step
    * ([[graft.operators.TextAnalysis]] unigram fit), so fit and apply
    * segment identically by construction. */
  private[graft] def segmentPieces(word: String, t: Table): Array[String] = {
    // code-point symbol boundaries: cps(i) = UTF-16 offset of cp i,
    // with the terminal offset appended so substring(cps(a), cps(b))
    // slices cp range [a, b)
    val cps = {
      val b = Array.newBuilder[Int]
      var j = 0
      while (j < word.length) {
        b += j
        j += Character.charCount(word.codePointAt(j))
      }
      b += word.length
      b.result()
    }
    val len = cps.length - 1
    val dp = new Array[Long](len + 1)
    var k = 1
    while (k <= len) {
      var best = Long.MaxValue
      var p = 1
      while (p <= PieceMax && p <= k) {
        val piece = word.substring(cps(k - p), cps(k))
        val idx = t.lookup.get(piece)
        val cost =
          if (idx != null) t.costArr(idx.intValue())
          else if (p == 1) UnkCostMicro
          else -1L
        if (cost >= 0) {
          val cand = dp(k - p) + cost
          if (cand < best) best = cand
        }
        p += 1
      }
      dp(k) = best
      k += 1
    }
    // backtrack preferring the LONGEST piece achieving dp(k) — recompute
    // rather than trust bp's tie order, so the rule is stated once
    val pieces = new java.util.ArrayList[String]()
    k = len
    while (k > 0) {
      var chosen = 1
      var p = math.min(PieceMax, k)
      var found = false
      while (p >= 1 && !found) {
        val piece = word.substring(cps(k - p), cps(k))
        val idx = t.lookup.get(piece)
        val cost =
          if (idx != null) t.costArr(idx.intValue())
          else if (p == 1) UnkCostMicro
          else -1L
        if (cost >= 0 && dp(k - p) + cost == dp(k)) { chosen = p; found = true }
        p -= 1
      }
      pieces.add(word.substring(cps(k - chosen), cps(k)))
      k -= chosen
    }
    val arr = new Array[String](pieces.size())
    var i = 0
    while (i < arr.length) { arr(i) = pieces.get(arr.length - 1 - i); i += 1 }
    arr
  }

  private def segmentWord(word: String, t: Table, out: java.util.ArrayList[Any]): Unit = {
    val ps = segmentPieces(word, t)
    var i = 0
    while (i < ps.length) {
      val idx = t.lookup.get(ps(i))
      out.add(Int.box(if (idx != null) idx.intValue() else -1))
      i += 1
    }
  }
}
