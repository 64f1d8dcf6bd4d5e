package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends GraftSpecBase {

  test("every relational query runs and returns rows with expected columns") {
    for ((name, fn) <- Relational.queries) {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every relational query has an oracle") {
    assert(Relational.oracles.keySet == Relational.queries.keySet)
  }

  test("q1_agg groups cover all flag/status combos present in data") {
    val out = Relational.q1Agg(spark, sfDir)
    val distinct = spark.read
      .parquet(s"$sfDir/lineitem.parquet")
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .count()
    assert(out.count() == distinct)
  }

  test("q1_seg_pct percents sum to ~100") {
    val total = Relational
      .q1SegPct(spark, sfDir)
      .agg(sum("pct_of_total"))
      .collect()(0)
      .getDouble(0)
    assert(math.abs(total - 100.0) < 0.5)
  }

  test("q4_rank_nations rank 1 has pct_of_top 100") {
    val top = Relational.q4RankNations(spark, sfDir).filter(col("rank_in_world") === 1).collect()
    assert(top.nonEmpty && top.forall(_.getAs[Double]("pct_of_top") == 100.0))
  }

  test("semi + anti partition the filtered customer set") {
    val c = spark.read.parquet(s"$sfDir/customer.parquet").count()
    val semi = Relational.joinSemi(spark, sfDir).count()
    assert(semi <= c && semi > 0)
  }

  test("full-outer reconcile keeps union of both sides, gap arithmetic exact") {
    val r = Relational.joinFullOuter(spark, sfDir).collect()
    // direct recompute of each side
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_acctbal") > 9900.0).count()
    val supp = spark.read.parquet(s"$sfDir/supplier.parquet")
      .filter(col("s_acctbal") > 8000.0).count()
    assert(r.map(_.getAs[Long]("n_rich_cust")).sum == cust)
    assert(r.map(_.getAs[Long]("n_rich_supp")).sum == supp)
    // no row exists with BOTH sides absent, and gap is exactly the difference
    assert(r.forall(row => row.getAs[Long]("n_rich_cust") > 0 || row.getAs[Long]("n_rich_supp") > 0))
    assert(r.forall(row =>
      row.getAs[Long]("gap") == row.getAs[Long]("n_rich_cust") - row.getAs[Long]("n_rich_supp")))
  }

  test("broadcast hint survives into the physical plan of q5_join_revenue") {
    val plan = Relational
      .q5JoinRevenue(spark, sfDir)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }
}
