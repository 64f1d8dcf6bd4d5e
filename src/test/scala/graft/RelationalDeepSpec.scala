package graft

import graft.operators.RelationalDeep
import org.apache.spark.sql.functions._

/** Second relational wave: structural checks + the plan shapes each query
  * exists to demonstrate (exchange reuse for the scalar-total forms, a
  * hash join — not a nested loop — under q19's disjunction, the window
  * decorrelation in q17). Cell-level correctness is the DuckDB oracle's
  * job (tools/check.py). */
class RelationalDeepSpec extends GraftSpecBase {

  test("every deep relational query runs, returns rows, and has an oracle") {
    RelationalDeep.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
      assert(RelationalDeep.oracles.contains(name), s"$name has no oracle")
    }
  }

  test("q11/q15 scalar-total branch reuses the per-key exchange (one fact scan)") {
    for ((name, fn) <- Seq(
        "q11_concentration" -> RelationalDeep.q11Concentration _,
        "q15_top_supplier" -> RelationalDeep.q15TopSupplier _)) {
      val df = fn(spark, sfDir)
      df.collect() // AQE finalizes stage reuse only at execution
      val finalPlan = df.queryExecution.executedPlan
        .collectFirst { case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan }
        .getOrElse(df.queryExecution.executedPlan)
      val s = finalPlan.toString
      val lineitemScans = "lineitem.parquet".r.findAllIn(s).size
      assert(lineitemScans == 1, s"$name scanned lineitem $lineitemScans times:\n$s")
      assert(s.contains("ReusedExchange") || s.contains("ReusedSubquery") ||
        s.contains("TableCacheQueryStage"),
        s"$name: scalar-total branch not reused:\n$s")
    }
  }

  test("q19's disjunctive predicate keeps the part join a hash equi-join") {
    val plan = RelationalDeep.q19Brackets(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"disjunction degraded to a nested loop:\n$plan")
    assert(plan.contains("HashJoin"), s"expected a hash join on partkey:\n$plan")
  }

  test("q17 decorrelates the per-part average to a window — no join-back, one lineitem scan") {
    val df = RelationalDeep.q17SmallQty(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val lineitemScans = "lineitem.parquet".r.findAllIn(plan).size
    assert(lineitemScans == 1, s"q17 scanned lineitem $lineitemScans times:\n$plan")
    assert(plan.contains("Window"), s"expected the window decorrelation in:\n$plan")
  }

  test("q13 keeps zero-order customers (left join filter lives in the ON clause)") {
    val rows = RelationalDeep.q13CustDist(spark, sfDir).collect()
    val customers = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(rows.map(_.getAs[Long]("custdist")).sum == customers,
      "every customer must appear in exactly one count bucket")
  }

  test("q15 surfaces every tied argmax supplier with the quarter's max revenue") {
    val r = RelationalDeep.q15TopSupplier(spark, sfDir).collect()
    assert(r.nonEmpty)
    val revs = r.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, s"argmax rows must share one revenue value, got ${revs.toSeq}")
  }

  test("q22's anti join complement is consistent: no surfaced segment customer has an urgent order") {
    val total = RelationalDeep.q22IdleRich(spark, sfDir)
      .agg(sum(col("n_custs"))).collect()(0).getLong(0)
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    val pos = c.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
        count(lit(1)).cast("double")).as("t"))
      .collect()(0).getDouble(0)
    val expected = c.filter(col("c_acctbal") > pos)
      .join(o, c("c_custkey") === o("o_custkey"), "left_anti").count()
    assert(total == expected, s"q22 kept $total custs, reference complement has $expected")
  }
}
