package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

class AnalyticsSpec extends GraftSpecBase {

  test("all analytics queries run and return rows") {
    for ((name, fn) <- Analytics.queries)
      assert(fn(spark, sfDir).count() > 0, s"$name empty")
  }

  test("keyProbe: skew census and salt factor on a known-skew key space") {
    import spark.implicits._
    // one hot key with 100 rows + 100 singleton keys
    val df = (Seq.fill(100)(1L) ++ (2L to 101L)).toDF("k")
    val r = Analytics.keyProbe(df, "k", "t.k").collect()(0)
    assert(r.getAs[String]("key_name") == "t.k")
    assert(r.getAs[Long]("n_rows") == 200L)
    assert(r.getAs[Long]("n_keys") == 101L)
    assert(r.getAs[Long]("max_key_rows") == 100L)
    // heavy iff c > (10*200) DIV 101 = 19 -> only the hot key
    assert(r.getAs[Long]("heavy_keys") == 1L)
    // floor-average is 1 row/key -> the hot key needs 100 salts
    assert(r.getAs[Long]("salt_factor") == 100L)
    assert(r.getAs[Double]("top_share") == 0.5)
  }

  test("skew_probe covers the five fact keys and each probe's n_rows is the table count") {
    val rows = Analytics.skewProbe(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("key_name")).toSeq == Seq(
      "events.user_id", "lineitem.l_orderkey", "lineitem.l_partkey",
      "lineitem.l_suppkey", "orders.o_custkey"))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    for (r <- rows if r.getAs[String]("key_name").startsWith("lineitem"))
      assert(r.getAs[Long]("n_rows") == li)
    for (r <- rows) {
      assert(r.getAs[Long]("max_key_rows") >= 1L)
      assert(r.getAs[Long]("n_keys") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("salt_factor") >= 1L)
    }
  }

  test("join_skew_salted is row-identical to the plain join aggregate") {
    val salted = Analytics.joinSkewSalted(spark, sfDir).collect().map(_.toSeq).toSeq
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
    val n = spark.read.parquet(s"$sfDir/nation.parquet")
    val plain = li
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        count(lit(1)).as("n_items"),
        sum(expr("CAST(l_extendedprice AS DECIMAL(14,2)) * " +
          "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"))
          .cast("double").as("revenue"))
      .orderBy("n_name")
      .collect().map(_.toSeq).toSeq
    assert(salted == plain, "salting must change partitioning, never the result")
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

  test("moments match a brute-force population skew/kurtosis per segment") {
    val got = Analytics.moments(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .join(
        spark.read.parquet(s"$sfDir/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), floor(col("o_totalprice") / 1000).cast("long").as("v"))
      .collect()
      .groupBy(_.getString(0))
    for ((seg, rs) <- rows) {
      val vs = rs.map(_.getAs[Long]("v").toDouble)
      val n = vs.length.toDouble
      val m1 = vs.sum / n
      val m2 = vs.map(x => (x - m1) * (x - m1)).sum / n
      val m3 = vs.map(x => math.pow(x - m1, 3)).sum / n
      val m4 = vs.map(x => math.pow(x - m1, 4)).sum / n
      val row = got(seg)
      assert(row.getAs[Long]("n_orders") == rs.length.toLong)
      assert(math.abs(row.getAs[Double]("skewness") - m3 / math.pow(m2, 1.5)) < 2e-4, seg)
      assert(math.abs(row.getAs[Double]("kurtosis") - (m4 / (m2 * m2) - 3)) < 2e-4, seg)
    }
  }

  test("date growth: ratios are the exact lagged-cents quotients, leading rows NULL") {
    val rows = Analytics.dateGrowth(spark, sfDir).collect()
    assert(rows.head.isNullAt(rows.head.fieldIndex("qoq_ratio")), "first quarter has no QoQ")
    assert(rows.take(4).forall(_.isNullAt(rows.head.fieldIndex("yoy_ratio"))),
      "first four quarters have no YoY")
    // recompute from the visible exact-cents series
    val cents = rows.map(r => math.round(r.getAs[Double]("total_price") * 100))
    for (i <- 1 until rows.length) {
      val expect = BigDecimal(cents(i).toDouble / cents(i - 1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rows(i).getAs[Double]("qoq_ratio") == expect, s"row $i")
    }
    for (i <- 4 until rows.length) {
      val expect = BigDecimal(cents(i).toDouble / cents(i - 4))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rows(i).getAs[Double]("yoy_ratio") == expect, s"row $i")
    }
  }

  test("basket pairs: support recomputes directly, lift is the exact ratio") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val nOrders = li.select(countDistinct("ok")).collect()(0).getLong(0)
    val rows = Analytics.basketPairs(spark, sfDir).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    for (r <- rows.take(3)) {
      val (p1, p2) = (r.getAs[Long]("p1"), r.getAs[Long]("p2"))
      val direct = li.filter(col("pk") === p1).select("ok")
        .intersect(li.filter(col("pk") === p2).select("ok")).count()
      assert(r.getAs[Long]("n_pair") == direct, s"pair ($p1,$p2)")
      val expect = BigDecimal(
        r.getAs[Long]("n_pair").toDouble * nOrders / r.getAs[Long]("n_p1") / r.getAs[Long]("n_p2"))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("lift") == expect)
    }
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

  test("corr: coefficients bounded, exact replay agrees") {
    val rows = Analytics.corrQtyPrice(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val data = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"), floor(col("l_quantity")).cast("long"),
        floor(col("l_extendedprice") * 100.0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ref = data.groupBy(_._1).map { case (f, xs) =>
      val n = BigInt(xs.length)
      val sx = xs.map(e => BigInt(e._2)).sum; val sy = xs.map(e => BigInt(e._3)).sum
      val sxy = xs.map(e => BigInt(e._2) * BigInt(e._3)).sum
      val sxx = xs.map(e => BigInt(e._2) * BigInt(e._2)).sum
      val syy = xs.map(e => BigInt(e._3) * BigInt(e._3)).sum
      val (nd, sxd, syd, sxyd, sxxd, syyd) =
        (n.toDouble, sx.toDouble, sy.toDouble, sxy.toDouble, sxx.toDouble, syy.toDouble)
      val vx = nd * sxxd - sxd * sxd; val vy = nd * syyd - syd * syd
      val c =
        if (vx > 0 && vy > 0)
          Some(BigDecimal.valueOf((nd * sxyd - sxd * syd) / (math.sqrt(vx) * math.sqrt(vy)))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        else None
      f -> (xs.length.toLong, c)
    }
    assert(rows.length == ref.size)
    for (r <- rows) {
      val (n, c) = ref(r.getString(0))
      assert(r.getLong(1) == n)
      val got = if (r.isNullAt(4)) None else Some(r.getDouble(4))
      assert(got == c, s"corr mismatch for ${r.getString(0)}: $got vs $c")
      got.foreach(v => assert(v >= -1.0 && v <= 1.0, s"corr out of range: $v"))
    }
  }

  test("winsorized: nearest-rank thresholds and clamped mean match a sorted replay") {
    val rows = Analytics.winsorized(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cents = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_totalprice").isNotNull && !isnan(col("o_totalprice")) &&
        abs(col("o_totalprice")) <= 1.0e14)
      .select(col("o_custkey"), floor(col("o_totalprice") * 100.0).cast("long").as("c"))
      .collect()
      .flatMap(r => cust.get(r.getLong(0)).map(_ -> r.getLong(1)))
    def r4(v: Double): Double =
      BigDecimal.valueOf(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r2(v: Double): Double =
      BigDecimal.valueOf(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ref = cents.groupBy(_._1).map { case (seg, vs) =>
      val s = vs.map(_._2).sorted
      val n = s.length.toLong
      val lo = s(((5 * n + 99) / 100).toInt - 1)
      val hi = s(((95 * n + 99) / 100).toInt - 1)
      val winSum = s.map(c => math.min(math.max(c, lo), hi)).map(BigInt(_)).sum
      seg -> (n, r2(lo / 100.0), r2(hi / 100.0),
        r4(winSum.toDouble / (100.0 * n.toDouble)),
        r4(s.map(BigInt(_)).sum.toDouble / (100.0 * n.toDouble)))
    }
    assert(rows.length == ref.size)
    for (r <- rows) {
      val (n, lo, hi, wm, rm) = ref(r.getString(0))
      assert(r.getLong(1) == n && r.getDouble(2) == lo && r.getDouble(3) == hi,
        s"threshold mismatch in $r vs ($n,$lo,$hi)")
      assert(r.getDouble(4) == wm && r.getDouble(5) == rm,
        s"mean mismatch in $r vs ($wm,$rm)")
      // band check at 2dp-rounding tolerance (p5/p95 round to cents, the
      // means to 4dp — a boundary segment could round across by < 0.01)
      assert(lo <= hi && lo - 0.01 <= wm && wm <= hi + 0.01,
        s"winsorized mean must sit inside its own clamp band: $r")
    }
  }
}
