package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

class AnalyticsSpec extends GraftSpecBase {

  test("all analytics queries run and return rows") {
    for ((name, fn) <- Analytics.queries)
      assert(fn(spark, sfDir).count() > 0, s"$name empty")
  }

  test("rollup contains grand total equal to full customer count") {
    val total = Analytics
      .rollup(spark, sfDir)
      .filter(col("region") === "<all>" && col("nation") === "<all>")
      .collect()(0)
      .getAs[Long]("n_customers")
    assert(total == spark.read.parquet(s"$sfDir/customer.parquet").count())
  }

  test("grouping sets: exactly the two 1-dim slices + grand total, no cross cells") {
    val gs = Analytics.groupingSets(spark, sfDir).collect()
    // every row has at least one '<all>' — the (segment × status) cross
    // cells cube would add are absent by construction
    assert(gs.forall(r => r.getString(0) == "<all>" || r.getString(1) == "<all>"))
    val grand = gs.filter(r => r.getString(0) == "<all>" && r.getString(1) == "<all>")
    assert(grand.length == 1)
    val total = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(grand(0).getAs[Long]("n_orders") == total)
    // each 1-dim slice partitions the same order population
    val bySeg = gs.filter(r => r.getString(0) != "<all>").map(_.getAs[Long]("n_orders")).sum
    val byStat = gs.filter(r => r.getString(1) != "<all>").map(_.getAs[Long]("n_orders")).sum
    assert(bySeg == total && byStat == total)
  }

  test("pivot rows sum to total event count") {
    val p = Analytics.pivot(spark, sfDir)
    val summed = p
      .select((col("click") + col("view") + col("purchase") + col("signup") + col("error")).as("s"))
      .agg(sum("s"))
      .collect()(0)
      .getLong(0)
    assert(summed == spark.read.parquet(s"$sfDir/events.parquet").count())
  }

  test("histogram buckets cover all orders") {
    val n = Analytics.histogram(spark, sfDir).agg(sum("n_orders")).collect()(0).getLong(0)
    assert(n == spark.read.parquet(s"$sfDir/orders.parquet").count())
  }

  test("percentiles: p50 <= p90 everywhere") {
    val bad = Analytics
      .percentiles(spark, sfDir)
      .filter(col("median_price") > col("p90_price"))
      .count()
    assert(bad == 0)
  }

  test("dash_metrics is a single row of positive sums") {
    val r = Analytics.dashMetrics(spark, sfDir).collect()
    assert(r.length == 1 && r(0).toSeq.forall(_.asInstanceOf[Long] > 0))
  }
}
