package graft

import graft.operators.{Relational, Scale, Similarity, Windows}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the scale properties SURVEY.md §4 promises. */
class ScaleSpec extends GraftSpecBase {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // at sf0.001 the optimizer would (rightly) broadcast; disable it so the
    // plan shows what a 100 TB fact-fact join would do with these buckets
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Scale.bucketedOrdersJoin(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      // the join inputs are bucketed scans; only the final groupBy may
      // shuffle. assert no Exchange BELOW the join.
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected SortMergeJoin in:\n$plan")
      val belowJoin = plan.substring(joinIdx)
      val exchangesBelow = "Exchange hashpartitioning".r.findAllIn(belowJoin).size
      assert(exchangesBelow == 0, s"bucketed join still shuffles:\n$plan")
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join returns exactly the plain join's rows") {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val plain = o
      .join(c, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey")
    val salted = Scale
      .saltedJoin(o, c, col("o_custkey"), col("c_custkey"), salt = 4)
      .select("o_orderkey", "c_custkey")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("q1_agg scan reads only the five needed columns") {
    val plan = Relational
      .q1Agg(spark, sfDir)
      .queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    val read = plan.split("\n").find(_.contains("ReadSchema")).getOrElse("")
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus"))
      assert(read.contains(c), s"missing $c in $read")
    for (c <- Seq("l_orderkey", "l_partkey", "l_shipdate", "l_tax"))
      assert(!read.contains(c), s"unpruned $c in $read")
  }

  test("banded range join never plans a nested loop") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Windows.rangeJoin(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("IVF assignment is a narrow map: only the 1-row codebook nested-loops") {
    val plan = Similarity.annIvf(spark, sfDir).queryExecution.executedPlan.toString
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    // two intentional 1-row codebook cross joins (assignment + probes);
    // anything more means a candidate path degenerated to all-pairs
    assert(nlj <= 2, s"unexpected nested loops ($nlj) in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
  }

  test("knn centroid aggregation runs on the ObjectHashAggregate path") {
    val plan = Similarity.knnJoin(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"graft_vec_sum not object-hash-aggregated:\n$plan")
    assert(!plan.contains("Generate explode"), s"posexplode crept back in:\n$plan")
  }

  test("q5_join_revenue pushes the region filter into the parquet scan") {
    val plan = Relational
      .q5JoinRevenue(spark, sfDir)
      .queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("EqualTo(r_name,ASIA)"), "region filter not pushed down")
  }
}
