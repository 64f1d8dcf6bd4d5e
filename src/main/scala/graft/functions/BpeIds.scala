package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenization to id arrays in ONE native pass —
  * `graft_bpe_ids(text, lefts, rights, ranks)` where the three tail
  * arguments are foldable literal arrays describing the learned merge
  * table in rank order.
  *
  * Exists because the declarative rendering (an M-deep nest of
  * `transform`/`aggregate` lambdas, one per merge) runs on the
  * INTERPRETED higher-order-function path: measured ~15 s to materialize
  * ids for a 1.5 MB corpus — the whole-stage-codegen rule of §3 applied
  * to the trainable-artifact kernel, same story as MinHash64 replacing
  * the 64-wide aggregate. Here: one JVM static call per row, the merge
  * table pre-parsed ONCE per plan into primitive arrays + a hash map.
  *
  * Semantics (pinned by TrainingSpec's plain-Scala reference tokenizer
  * and the unicode kernel fuzz): split on single spaces, empties
  * dropped; symbols are CODE POINTS — the same expansion
  * [[graft.operators.TextAnalysis.bpeTrain]]'s `substring(w, i, 1)`
  * builds on the FIT side, so a merge learned from astral text (one
  * 😀 symbol, two UTF-16 chars) finds the identical symbol here and
  * fires (a UTF-16-char split would leave every such merge permanently
  * inert — fit/apply consistency is the whole contract); each merge
  * applies greedily left-to-right in rank order; a single-code-point
  * symbol's id is its code point, a merged symbol's id is 0x110000 +
  * the LOWEST rank producing that text, an unknown multi-code-point
  * symbol (impossible from a well-formed table) is NULL. NULL text →
  * empty array, never NULL.
  */
case class BpeIds(text: Expression, lefts: Expression, rights: Expression, ranks: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(text, lefts, rights, ranks)

  override def checkInputDataTypes(): TypeCheckResult = {
    def strArr(e: Expression) = e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    val intArr = ranks.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_ids requires STRING text, got ${text.dataType.sql}")
    else if (!strArr(lefts) || !strArr(rights) || !intArr)
      TypeCheckResult.TypeCheckFailure(
        "graft_bpe_ids requires (text STRING, lefts ARRAY<STRING>, rights ARRAY<STRING>, " +
          "ranks ARRAY<INT>)")
    else if (!lefts.foldable || !rights.foldable || !ranks.foldable)
      TypeCheckResult.TypeCheckFailure("graft_bpe_ids merge-table arguments must be literals")
    else {
      // the type check admits ARRAY literals containing NULLs (or a NULL
      // array), which the once-per-plan table parse would hit as a raw
      // NPE — reject them here with a diagnosable message instead. The
      // arguments are foldable by the check above, so eval() is safe and
      // cheap (≤ M elements, once at analysis).
      val nullWhere = Seq("lefts" -> lefts, "rights" -> rights, "ranks" -> ranks).collectFirst {
        case (name, e) if e.eval() == null => s"$name is NULL"
        case (name, e)
            if {
              val a = e.eval().asInstanceOf[ArrayData]
              (0 until a.numElements()).exists(a.isNullAt)
            } =>
          s"$name contains a NULL element"
      }
      nullWhere
        .map(w => TypeCheckResult.TypeCheckFailure(s"graft_bpe_ids merge table: $w"))
        .getOrElse(TypeCheckResult.TypeCheckSuccess)
    }
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)

  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  /** Merge table parsed once per plan (the literal children never change
    * within one expression instance). */
  @transient private lazy val table: BpeIds.Table = {
    def strs(e: Expression): Array[String] = {
      val a = e.eval().asInstanceOf[ArrayData]
      Array.tabulate(a.numElements())(i => a.getUTF8String(i).toString)
    }
    val r = ranks.eval().asInstanceOf[ArrayData]
    new BpeIds.Table(
      strs(lefts), strs(rights), Array.tabulate(r.numElements())(i => r.getInt(i)))
  }

  override def eval(input: InternalRow): Any =
    BpeIds.tokenize(text.eval(input).asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("bpeTable", table, classOf[BpeIds.Table].getName)
    val c = text.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.BpeIds.tokenize(${c.isNull} ? null : ${c.value}, $tRef);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), lefts = newChildren(1), rights = newChildren(2),
      ranks = newChildren(3))

  override def prettyName: String = "graft_bpe_ids"
}

object BpeIds {

  /** Pre-parsed merge table: rank-ordered primitive arrays plus the
    * merged-text → id map (lowest rank wins — first in rank order). */
  final class Table(val lefts: Array[String], val rights: Array[String], ranks: Array[Int])
      extends Serializable {
    require(lefts.length == rights.length && lefts.length == ranks.length,
      s"merge table arrays disagree: ${lefts.length}/${rights.length}/${ranks.length}")
    val merged: Array[String] = Array.tabulate(lefts.length)(i => lefts(i) + rights(i))
    /** merge application order = rank order */
    val order: Array[Int] = ranks.indices.sortBy(ranks(_)).toArray
    val ids: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      for (i <- order) if (!m.containsKey(merged(i))) m.put(merged(i), 0x110000 + ranks(i))
      m
    }
  }

  /** One-pass tokenize; see the expression scaladoc for the contract. */
  def tokenize(text: UTF8String, t: Table): ArrayData = {
    val s = if (text == null) "" else text.toString
    val out = new java.util.ArrayList[Any]()
    var wStart = 0
    val n = s.length
    var pos = 0
    while (pos <= n) {
      if (pos == n || s.charAt(pos) == ' ') {
        if (pos > wStart) tokenizeWord(s, wStart, pos, t, out)
        wStart = pos + 1
      }
      pos += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def tokenizeWord(
      s: String,
      from: Int,
      until: Int,
      t: Table,
      out: java.util.ArrayList[Any]): Unit = {
    // code-point symbols (an astral char is ONE symbol of two UTF-16
    // chars) — the fit side's substring() expansion, see class doc
    var len = 0
    var i = from
    val syms = new Array[String](until - from)
    while (i < until) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      syms(len) = s.substring(i, i + w)
      len += 1
      i += w
    }
    var mi = 0
    while (mi < t.order.length) {
      val m = t.order(mi)
      val l = t.lefts(m); val r = t.rights(m); val lr = t.merged(m)
      // greedy left-to-right in place: out pointer w trails read pointer k
      var w = 0
      var k = 0
      while (k < len) {
        val x = syms(k)
        if (w > 0 && (syms(w - 1) == l) && (x == r)) syms(w - 1) = lr
        else { syms(w) = x; w += 1 }
        k += 1
      }
      len = w
      mi += 1
    }
    var j = 0
    while (j < len) {
      val tok = syms(j)
      if (tok.codePointCount(0, tok.length) == 1) out.add(Int.box(tok.codePointAt(0)))
      else out.add(t.ids.get(tok)) // null for an unknown merged text
      j += 1
    }
  }
}
