package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public column-level vector API — the building blocks the similarity /
  * dedup operators are assembled from, exposed for library users composing
  * their own pipelines.
  *
  * Discipline (same as everywhere in graft): float vectors are quantized
  * to integer thousandths so dots and norms are EXACT integer sums
  * (order-independent, engine-independent); the only float operations are
  * one final sqrt/divide per score, each exactly-rounded IEEE. This is
  * what makes results reproducible across engines and across cluster
  * repartitionings — raw-double dot products are neither.
  */
object VectorOps {

  /** Quantize a float/double array column to integer thousandths. */
  def quantize(c: Column): Column =
    transform(c, x => floor(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two BIGINT-array columns (native
    * codegen'd [[LongArrayDot]]). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Exact integer squared norm. */
  def selfDot(c: Column): Column = dot(c, c)

  /** Cosine similarity given the two quantized vectors and their
    * precomputed squared norms (precompute norms once per side — never
    * inside a join condition). Precondition: both norms > 0 — a
    * zero-direction vector has no cosine and the division raises
    * DIVIDE_BY_ZERO under ANSI; graft's own operators guarantee this by
    * the validity gate in `Similarity.quantizedEmbeddings`, and callers
    * composing their own pipelines must filter the same way. */
  def cosine(a: Column, na: Column, b: Column, nb: Column): Column =
    dot(a, b) / (sqrt(na) * sqrt(nb))
}
