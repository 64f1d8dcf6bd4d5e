package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed length of a text column, in one pass.
  *
  * The compressibility quality signal (CCNet/Gopher family): boilerplate
  * and degenerate repetition compress far below natural prose, so
  * `deflate_len / n_bytes` separates machine-generated loops from real
  * text with a single scan. Computed as one JVM static call from
  * generated code (java.util.zip.Deflater, level 6, raw stream — no
  * gzip header so tiny inputs aren't swamped by framing), no shuffle,
  * no row blow-up.
  *
  * Engine-specific byte stream → consumers are rows-only checked (the
  * ratio depends on the zlib implementation); FunctionsSpec pins the
  * invariants that matter: determinism, positivity, and that repetition
  * compresses an order of magnitude below high-entropy text.
  *
  * Registered as SQL function `graft_deflate_len` by [[graft.GraftExtensions]].
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_deflate_len requires STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    DeflateLen.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateLen.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_deflate_len"
}

object DeflateLen {

  /** Raw-DEFLATE length at the default level. A fresh Deflater per call
    * keeps the expression thread-safe under whole-stage codegen (one
    * call per row; Deflater is cheap to construct relative to the
    * compression work on document-sized inputs). */
  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}
