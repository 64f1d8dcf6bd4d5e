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

  test("q20: dominance set matches a plain-Scala replay of the exact 2q > t test") {
    val got = RelationalDeep.q20ExcessShippers(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    val red = spark.read.parquet(s"$sfDir/part.parquet").collect()
      .filter(_.getAs[String]("p_name").startsWith("red"))
      .map(_.getAs[Long]("p_partkey")).toSet
    val sh = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") < "1996-01-01")
      .select("l_suppkey", "l_partkey", "l_quantity").collect()
      .filter(r => red(r.getLong(1)))
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case (k, rs) => k -> rs.map(r => math.floor(r.getDouble(2)).toLong).sum }
    val tot = sh.groupBy(_._1._2).map { case (p, xs) => p -> xs.values.sum }
    // .toSeq first: collect on a Map producing pairs would rebuild a Map
    // and silently deduplicate multiple dominated parts per supplier
    val ref = sh.toSeq
      .collect { case ((su, p), q) if 2 * q > tot(p) => (su, q * 1000000L / tot(p)) }
      .groupBy(_._1)
      .map { case (su, xs) => su -> ((xs.size.toLong, xs.map(_._2).max)) }
    assert(got == ref, s"q20 drifted: got ${got.toSeq.sorted} vs ${ref.toSeq.sorted}")
    assert(got.nonEmpty, "fixture yields no dominant supplier — shape vacuous")
  }

  test("q2: the min-price pick matches a rational argmin replay with deterministic ties") {
    val got = RelationalDeep.q2MinPriceSupplier(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(5)))).toMap
    val sized = spark.read.parquet(s"$sfDir/part.parquet").collect()
      .filter(_.getAs[Int]("p_size") == 15)
      .map(_.getAs[Long]("p_partkey")).toSet
    val ps = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_quantity") > 0)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity").collect()
      .filter(r => sized(r.getLong(0)))
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case ((p, su), rs) =>
        val sc = rs.map(r => math.floor(r.getDouble(2) * 100.0).toLong).sum
        val qt = rs.map(r => math.floor(r.getDouble(3)).toLong).sum
        (p, su, (BigInt(sc) * 10000 / qt).toLong)
      }
    val ref = ps.groupBy(_._1).map { case (p, xs) =>
      val best = xs.minBy(x => (x._3, x._2))
      p -> ((best._2, best._3))
    }
    assert(got == ref, "q2 argmin drifted")
    assert(got.nonEmpty, "no size-15 parts shipped — shape vacuous")
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

  test("q6: every filter reaches the lineitem scan and only four columns are read") {
    val plan = RelationalDeep.q6Forecast(spark, sfDir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    for (f <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(("PushedFilters:[^\\n]*" + f).r.findFirstIn(plan).isDefined,
        s"$f not pushed to the scan:\n$plan")
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_returnflag"),
      s"q6 reads columns it never touches: $readSchema")
  }

  test("q4: EXISTS decorrelates to a LEFT SEMI join and counts match a direct census") {
    val plan = RelationalDeep.q4PriorityExists(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"q4 must plan a left-semi join:\n$plan")
    // direct census: distinct qualifying orders, grouped by priority
    val o = graft.sources.Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
    val l = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"))
    val want = o.join(l, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .select("o_orderkey", "o_orderpriority").distinct()
      .groupBy("o_orderpriority").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = RelationalDeep.q4PriorityExists(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want, s"semi-join census diverges from the distinct census: $got vs $want")
  }

  test("q9: summed profit equals revenue minus the declared cost model, computed separately") {
    val got = RelationalDeep.q9Profit(spark, sfDir)
      .agg(sum(col("profit"))).head.getDouble(0)
    val p = graft.sources.Tables.part(spark, sfDir)
      .filter(col("p_name").contains("red"))
      .select(col("p_partkey"), col("p_retailprice"))
    val base = graft.sources.Tables.lineitem(spark, sfDir)
      .join(p, col("l_partkey") === col("p_partkey"))
    val rev = base.agg(sum(expr(
      "CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"))).head.getDecimal(0)
    val cost = base.agg(sum(expr(
      "CAST(l_quantity AS DECIMAL(12,2)) * CAST(p_retailprice AS DECIMAL(12,2))"))).head.getDecimal(0)
    val want = rev.doubleValue - cost.doubleValue / 2.0
    assert(math.abs(got - want) < 1e-6 * math.max(1.0, math.abs(want)),
      s"profit total $got != rev - cost/2 = $want")
  }

  test("q12: the two conditional counts partition the late-line census exactly") {
    val rows = RelationalDeep.q12LateClass(spark, sfDir).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val want = graft.sources.Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
      .join(graft.sources.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 14 DAYS"))
      .count()
    assert(total == want, s"critical+regular = $total must equal the late-line count $want")
  }

  test("q3: top-10 unshipped orders all belong to the segment and are revenue-ordered") {
    val rows = RelationalDeep.q3Unshipped(spark, sfDir).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(1))
    assert(revs.zip(revs.drop(1)).forall { case (a, b) => a >= b }, "not revenue-descending")
    val seg = graft.sources.Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val orderCust = graft.sources.Tables.orders(spark, sfDir)
      .join(seg, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => orderCust(r.getLong(0))),
      "a surfaced order does not belong to a BUILDING customer")
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
