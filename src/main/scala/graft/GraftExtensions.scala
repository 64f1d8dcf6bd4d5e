package graft

import graft.functions.{LongArrayDot, SimHash64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension wiring for graft's native Catalyst expressions.
  *
  * Activated with `spark.sql.extensions=graft.GraftExtensions` (set by
  * [[GraftSession.builder]] and the Verify/Bench session builders), the
  * public, cluster-safe way to ship custom expressions: every executor
  * resolves the function from the session config, no registry hacking.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("graft_dot"),
        new ExpressionInfo(
          classOf[LongArrayDot].getName,
          null,
          "graft_dot",
          "graft_dot(a, b) - exact dot product of two BIGINT arrays",
          ""),
        (children: Seq[Expression]) => LongArrayDot(children.head, children(1))))
    ext.injectFunction(
      (
        FunctionIdentifier("graft_simhash"),
        new ExpressionInfo(
          classOf[SimHash64].getName,
          null,
          "graft_simhash",
          "graft_simhash(text) - 64-bit simhash of whitespace-tokenized text",
          ""),
        (children: Seq[Expression]) => SimHash64(children.head)))
  }
}
