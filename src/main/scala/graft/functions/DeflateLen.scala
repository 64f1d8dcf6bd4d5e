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

  /** One Deflater per task thread, reset between rows: a fresh Deflater
    * per call would pay a native malloc/free of the full zlib state
    * (~256 KB of window + hash chains) per ROW on the hot scan path —
    * for short documents the allocation would dominate the compression.
    * ThreadLocal keeps the same thread-safety under whole-stage codegen
    * while amortizing the native allocation to once per executor task
    * thread (bounded by the thread pool; the native state lives for the
    * thread's lifetime, which is the standard trade for per-row native
    * kernels). */
  private val local: ThreadLocal[java.util.zip.Deflater] =
    new ThreadLocal[java.util.zip.Deflater] {
      override def initialValue(): java.util.zip.Deflater =
        new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    }

  /** Raw-DEFLATE length of the UTF-8 bytes at the default level. */
  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
