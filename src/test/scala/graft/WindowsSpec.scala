package graft

import graft.operators.{Sampling, Windows}
import org.apache.spark.sql.functions._

class WindowsSpec extends GraftSpecBase {

  test("all window queries run with rows") {
    for ((name, fn) <- Windows.queries) {
      assert(fn(spark, sfDir).count() > 0, s"$name empty")
    }
  }

  test("sessionize: session ids start at 0 and are non-decreasing per user") {
    val bad = Windows
      .sessionize(spark, sfDir)
      .groupBy("user_id")
      .agg(min("session_id").as("mn"))
      .filter(col("mn") =!= 0)
      .count()
    assert(bad == 0)
  }

  test("session stats fold the sessionizer exactly: events conserved, means consistent") {
    val stats = Windows.sessionStats(spark, sfDir).collect()
    val totalEvents = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(stats.map(_.getAs[Long]("n_events")).sum == totalEvents)
    // per-user session count equals the sessionizer's max session id + 1
    val maxSess = Windows.sessionize(spark, sfDir)
      .groupBy("user_id").agg(max("session_id").as("m")).collect()
      .map(r => r.getAs[Long]("user_id") -> (r.getAs[Long]("m") + 1)).toMap
    assert(stats.forall(r => r.getAs[Long]("n_sessions") == maxSess(r.getAs[Long]("user_id"))))
    // the rounded mean is the exact ratio re-rounded
    assert(stats.forall { r =>
      val expect = BigDecimal(r.getAs[Long]("n_events").toDouble / r.getAs[Long]("n_sessions"))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      r.getAs[Double]("avg_session_events") == expect
    })
  }

  test("streaks match a brute-force scan of each user's sorted day set") {
    val got = Windows.streaks(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") -> ((r.getAs[Long]("best_streak"), r.getAs[Long]("start_day")))).toMap
    // canonical loader, not a raw read: the reference must survive the
    // driver's nano-vs-micro physical-type drift the same way the operator does
    val byUser = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").cast("long").as("dayno"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.keySet == byUser.keySet)
    for ((u, ds) <- byUser) {
      var best = 1L; var bestStart = ds.head
      var cur = 1L; var curStart = ds.head
      for (i <- 1 until ds.length) {
        if (ds(i) == ds(i - 1) + 1) cur += 1
        else { cur = 1; curStart = ds(i) }
        if (cur > best) { best = cur; bestStart = curStart }
      }
      assert(got(u) == ((best, bestStart)), s"user $u")
    }
  }

  test("topk returns at most 3 rows per event_type") {
    val over = Windows
      .topkPerType(spark, sfDir)
      .groupBy("event_type")
      .count()
      .filter(col("count") > 3)
      .count()
    assert(over == 0)
  }

  test("asof join matches each event to an order dated at or before it") {
    val e = Windows.asofJoin(spark, sfDir)
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
    val violations = e
      .join(o, e("matched_orderkey") === o("o_orderkey"))
      .filter(col("od_us") > col("ts_us"))
      .count()
    assert(violations == 0)
  }

  test("moving_avg covers every event exactly once") {
    val n = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(Windows.movingAvg(spark, sfDir).count() == n)
  }

  test("seasonality cells are a complete partition of events") {
    val cells = Windows.seasonality(spark, sfDir).collect()
    assert(cells.nonEmpty && cells.length <= 168, s"${cells.length} cells")
    assert(cells.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 6), "dow out of range")
    assert(cells.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= 23), "hour out of range")
    val total = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(cells.map(_.getLong(2)).sum == total, "events lost between cells")
    assert(math.abs(cells.map(_.getDouble(4)).sum - 100.0) <= 0.05, "shares don't sum to 100%")
  }

  test("ohlc matches a brute-force scan of each (day, type) cell") {
    val rows = Windows.ohlc(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // brute-force reference: group the raw events in plain Scala; micros
    // via the canonical loader so the reference is physical-type-agnostic
    // (the driver's data drops have carried both nano-long and micro ts)
    val raw = graft.sources.Tables.events(spark, sfDir)
    val ref = raw
      .select(col("event_id"), unix_micros(col("ts")).as("us"), col("event_type"), col("value"))
      .filter(col("value").isNotNull && abs(col("value")) <= 5.0e6)
      .collect()
      .map { r =>
        val us = r.getLong(1)
        (us - java.lang.Math.floorMod(us, 86400000000L), r.getString(2), us, r.getLong(0),
          math.floor(r.getDouble(3) * 100.0).toLong)
      }
      .groupBy(e => (e._1, e._2))
    for (r <- rows) {
      val cell = ref((r.getLong(0), r.getString(1))).sortBy(e => (e._3, e._4))
      assert(r.getLong(2) == cell.length, s"n_events mismatch in $r")
      assert(r.getDouble(3) == cell.head._5 / 100.0, s"open mismatch in $r")
      assert(r.getDouble(4) == cell.map(_._5).max / 100.0, s"high mismatch in $r")
      assert(r.getDouble(5) == cell.map(_._5).min / 100.0, s"low mismatch in $r")
      assert(r.getDouble(6) == cell.last._5 / 100.0, s"close mismatch in $r")
    }
    assert(rows.length == ref.size, "cells lost or invented")
  }

  test("deterministic sample is stable and ~5%") {
    val a = Sampling.deterministic(spark, sfDir).collect().map(_.getLong(0)).toSeq
    val b = Sampling.deterministic(spark, sfDir).collect().map(_.getLong(0)).toSeq
    assert(a == b)
    val total = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(a.size > total * 0.02 && a.size < total * 0.09, s"${a.size} of $total")
  }

  test("seeded sample is deterministic per seed and tracks the fraction") {
    val e = spark.read.parquet(s"$sfDir/events.parquet")
    val a = Sampling.seeded(e, 0.05).select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.seeded(e, 0.05).select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b, "same seed must select the same rows")
    val other = Sampling.seeded(e, 0.05, seed = 7L).select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a != other, "different seeds should select different rows")
    val total = e.count()
    assert(a.size > total * 0.02 && a.size < total * 0.09, s"${a.size} of $total")
  }

  test("stratified sample caps each stratum at 100") {
    val over = Sampling
      .stratified(spark, sfDir)
      .groupBy("event_type")
      .count()
      .filter(col("count") > 100)
      .count()
    assert(over == 0)
  }

  test("attribution: one row per purchase; NULL last_touch iff purchase opened its session") {
    val att = Windows.attribution(spark, sfDir).cache()
    val purchases = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase").count()
    assert(att.count() == purchases, "attribution must cover every purchase exactly once")
    assert(att.filter(col("first_touch").isNull).count() == 0, "first_touch can never be NULL")
    // a purchase with no predecessor IS its session's opener, so its
    // first touch must be the purchase itself
    val bad = att.filter(col("last_touch").isNull && col("first_touch") =!= "purchase").count()
    assert(bad == 0, "NULL last_touch implies the purchase opened the session")
    att.unpersist()
  }

  test("paths: trigram census matches a brute-force replay of every user's stream") {
    val rows = Windows.paths(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val census = ev
      .groupBy(_._1)
      .values
      .flatMap(_.sortBy(e => (e._2, e._3)).map(_._4).sliding(3).filter(_.length == 3))
      .toSeq
      .groupBy(t => (t(0), t(1), t(2)))
      .map { case (k, v) => (k, v.size.toLong) }
    val expected = census.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }
      .take(10)
    val got = rows.map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3))).toSeq
    assert(got == expected, s"top paths diverge:\n got=$got\n exp=$expected")
  }

  test("features: lag and trailing-week sums match a calendar-aware replay") {
    val rows = Windows.features(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = graft.sources.Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull && col("value").isNotNull &&
        !isnan(col("value")) && abs(col("value")) <= 5.0e6)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("d"),
        floor(col("value") * 100.0).cast("long").as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    assert(rows.length == daily.size, "one feature row per observed (user, day)")
    for (r <- rows) {
      val (u, d) = (r.getLong(0), r.getLong(1))
      assert(r.getDouble(2) == daily((u, d)) / 100.0)
      assert(r.getDouble(3) == daily.getOrElse((u, d - 1), 0L) / 100.0,
        s"lag-1d wrong for ($u,$d)")
      val wk = (d - 6 to d).flatMap(x => daily.get((u, x))).sum
      assert(r.getDouble(4) == wk / 100.0, s"trailing-7d wrong for ($u,$d)")
    }
  }

  test("active users: DAU/WAU census matches a contribution replay") {
    val rows = Windows.activeUsers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ud = graft.sources.Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dau = ud.groupBy(_._2).map { case (d, v) => d -> v.size.toLong }
    for (r <- rows) {
      val d = r.getLong(0)
      assert(r.getLong(1) == dau(d), s"dau wrong on day $d")
      val wau = ud.filter { case (_, a) => a >= d - 6 && a <= d }.map(_._1).size.toLong
      assert(r.getLong(2) == wau, s"wau wrong on day $d")
      assert(r.getLong(1) <= r.getLong(2), "DAU can never exceed WAU")
    }
    assert(rows.length == dau.size, "one row per observed day")
  }

  test("json extraction: property-bag drift is counted, never dropped") {
    val rows = Windows.jsonExtract(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total,
      "every event must land in exactly one type group")
    for (r <- rows) {
      assert(r.getAs[Long]("n_with_k") <= r.getAs[Long]("n_events"))
      if (r.getAs[Long]("n_with_k") > 0) {
        val (avg, mn, mx) =
          (r.getAs[Double]("avg_k"), r.getAs[Long]("min_k"), r.getAs[Long]("max_k"))
        assert(mn <= avg + 0.0001 && avg <= mx + 0.0001, s"avg outside [min,max]: $r")
      }
    }
  }

  test("interval dim: tiers partition the envelope — every valid event lands in exactly one") {
    val rows = Windows.intervalDim(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val valid = graft.sources.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull && !isnan(col("value")) && abs(col("value")) <= 5.0e6)
      .count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == valid,
      "tier rollup must cover each valid event exactly once (disjoint, gap-free tiers)")
    assert(rows.map(_.getAs[Int]("tier_ord")).distinct.length == rows.length)
  }

  test("ema: first observation is its own EMA; truncation tracks the untruncated fold") {
    val rows = Windows.ema(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1).values
    for (stream <- byUser) {
      val s = stream.sortBy(e => (e._2, e._3))
      assert(s.head._5 == s.head._4, s"first EMA must equal the first value: ${s.head}")
      // untruncated adjust=True EMA over the full history; the 21-term
      // dyadic truncation must agree to well under a display cent
      var num = 0.0; var den = 0.0
      for (e <- s) {
        num = num / 2.0 + e._4; den = den / 2.0 + 1.0
        assert(math.abs(e._5 - num / den) < 0.01,
          s"truncated EMA drifted from the full fold at $e: ${num / den}")
      }
    }
  }

  test("ema: alpha knob — 1/3 matches an exact BigInt reference, bad values fail loudly") {
    spark.conf.set("spark.graft.win.emaAlpha", "1/3")
    try {
      val rows = Windows.ema(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      assert(rows.nonEmpty)
      // q-adic weights for p/q=1/3: 1·2^k·3^(20−k) for lag k — the exact
      // integer reference of the operator's decimal accumulation
      val wts = (0 to 20).map(k => BigInt(2).pow(k) * BigInt(3).pow(20 - k))
      for (stream <- rows.groupBy(_._1).values) {
        val s = stream.sortBy(e => (e._2, e._3)).toVector
        val cents = s.map(e => BigInt(math.floor(e._4 * 100.0 + 0.5).toLong))
        for (i <- s.indices) {
          val lags = (0 to math.min(i, 20)).map(k => cents(i - k))
          val num = lags.zip(wts).map { case (c, w) => c * w }.sum
          val den = wts.take(lags.length).sum
          val want = BigDecimal(num.toDouble / (100.0 * den.toDouble))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(math.abs(s(i)._5 - want) < 1e-9,
            s"alpha=1/3 EMA diverges from the BigInt reference at ${s(i)}: want $want")
        }
      }
    } finally spark.conf.unset("spark.graft.win.emaAlpha")
    // malformed / out-of-range alphas must fail loudly, not fall back
    for (bad <- Seq("0.5", "2/1", "1/32", "0/3")) {
      spark.conf.set("spark.graft.win.emaAlpha", bad)
      try intercept[Exception](Windows.ema(spark, sfDir))
      finally spark.conf.unset("spark.graft.win.emaAlpha")
    }
  }

  test("twap: per-user time-weighted mean matches an exact integer replay") {
    val rows = Windows.twap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(
        col("user_id").isNotNull && col("ts").isNotNull && col("value").isNotNull &&
          !isnan(col("value")) && abs(col("value")) <= 5.0e6)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        floor(col("value") * 100.0).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ref = ev.groupBy(_._1).flatMap { case (u, obs) =>
      val s = obs.sortBy(e => (e._2, e._3))
      val wts = s.zip(s.tail).map { case (a, b) => (a._4, (b._2 - a._2) / 1000000L) }
      val sw = wts.map(_._2).sum
      if (sw > 0) {
        val swc = wts.map { case (c, w) => BigInt(c) * BigInt(w) }.sum
        val twap = BigDecimal
          .valueOf(swc.toDouble / (100.0 * sw.toDouble))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
        Some(u -> (wts.length.toLong, sw, twap))
      } else None
    }
    assert(rows.length == ref.size, "user coverage diverges")
    for (r <- rows) {
      val (n, sw, tw) = ref(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == sw && r.getDouble(3) == tw,
        s"twap mismatch for user ${r.getLong(0)}: $r vs ($n,$sw,$tw)")
    }
  }

  test("trend: per-user OLS slope/forecast match a BigInt replay of the closed form") {
    val rows = Windows.trend(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(
        col("user_id").isNotNull && col("ts").isNotNull && col("value").isNotNull &&
          !isnan(col("value")) && abs(col("value")) <= 5.0e6 && unix_micros(col("ts")) >= 0)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("x"),
        floor(col("value") * 100.0).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ref = ev.groupBy(_._1).map { case (u, obs) =>
      val n = BigInt(obs.length)
      val sx = obs.map(o => BigInt(o._2)).sum
      val sy = obs.map(o => BigInt(o._3)).sum
      val sxx = obs.map(o => BigInt(o._2) * o._2).sum
      val sxy = obs.map(o => BigInt(o._2) * o._3).sum
      val dayLast = obs.map(_._2).max
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      def hr(p: BigInt, scale: Long): Double =
        p.signum * ((p.abs * 2 * scale + den * 100) / (den * 200)).toDouble / scale
      val slope = if (den == 0) None else Some(hr(num, 1000000L))
      val fc =
        if (den == 0) None
        else Some(hr(sy * sxx - sx * sxy + num * BigInt(dayLast + 7), 10000L))
      u -> ((obs.length.toLong, dayLast, slope, fc))
    }
    assert(rows.length == ref.size, "user coverage diverges")
    for (r <- rows) {
      val (n, dl, slope, fc) = ref(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == dl, s"counts mismatch for ${r.getLong(0)}")
      val gotSlope = if (r.isNullAt(3)) None else Some(r.getDouble(3))
      val gotFc = if (r.isNullAt(4)) None else Some(r.getDouble(4))
      assert(gotSlope == slope && gotFc == fc,
        s"trend mismatch for user ${r.getLong(0)}: ($gotSlope,$gotFc) vs ($slope,$fc)")
    }
  }

  test("changepoint: argmax of the scaled CUSUM matches a BigInt replay, ties to earliest k") {
    val rows = Windows.changepoint(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(
        col("user_id").isNotNull && col("ts").isNotNull && col("value").isNotNull &&
          !isnan(col("value")) && abs(col("value")) <= 5.0e6)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
        floor(col("value") * 100.0).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def hr4(p: BigInt, q: BigInt): Double =
      p.signum * ((p.abs * 20000 + q) / (q * 2)).toDouble / 10000.0
    val ref = ev.groupBy(_._1).flatMap { case (u, obs0) =>
      val obs = obs0.sortBy(o => (o._2, o._3))
      val n = obs.length
      if (n < 2) None
      else {
        val s = obs.map(o => BigInt(o._4)).sum
        var pk = BigInt(0)
        val ds = obs.zipWithIndex.take(n - 1).map { case (o, i) =>
          pk += o._4
          val k = i + 1
          (k, o._2, pk, BigInt(n) * pk - BigInt(k) * s)
        }
        val (k, ts, p, d) = ds.maxBy { case (k, _, _, d) => (d.abs, BigInt(-k)) }
        val dir = if (d < 0) "up" else if (d > 0) "down" else "flat"
        Some(u -> ((n.toLong, k.toLong, ts, dir,
          hr4(d.abs, BigInt(n) * 100),
          hr4(p, BigInt(k) * 100),
          hr4(s - p, BigInt(n - k) * 100))))
      }
    }.toMap
    assert(rows.length == ref.size, s"user coverage diverges: ${rows.length} vs ${ref.size}")
    for (r <- rows) {
      val got = (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
        r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(got == ref(r.getLong(0)), s"changepoint drift for user ${r.getLong(0)}: " +
        s"$got vs ${ref(r.getLong(0))}")
    }
  }

  test("changepoint: a planted level shift is found at the exact boundary") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cusum").toString
    val dayUs = 86400000000L
    // user 1: five days at $10 then five at $20 — the changepoint is after
    // k=5 (the last $10 observation); direction up, means exact
    val rows = (1 to 10).map { i =>
      (i.toLong, i.toLong * dayUs, 1L, "view", if (i <= 5) 10.0 else 20.0, "{}")
    }
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = Windows.changepoint(spark, dir).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(2) == 5L, s"cp_k=${r.getLong(2)}")
    assert(r.getLong(3) == 5L * dayUs, "cp at the last pre-shift observation")
    assert(r.getString(4) == "up")
    // D_5 = 10·5000 − 5·15000 = −25000 cents·? → |D|/(n·100) = 25000/1000 = 25.0
    assert(r.getDouble(5) == 25.0, s"cusum_stat=${r.getDouble(5)}")
    assert(r.getDouble(6) == 10.0 && r.getDouble(7) == 20.0, "segment means")
  }

  test("cohort_ltv: cells match a plain-Scala replay and the cumulative curve is monotone") {
    val rows = Windows.cohortLtv(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.orders(spark, sfDir)
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).cast("long").as("m"),
        floor(col("o_totalprice") * 100.0).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cohort = ev.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val size = cohort.values.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
    val cells = ev.groupBy(e => (cohort(e._1), e._2 - cohort(e._1))).map { case (k, xs) =>
      k -> ((xs.map(_._1).distinct.length.toLong, xs.map(_._3).sum))
    }
    assert(rows.length == cells.size, "cell coverage diverges")
    val byCohort = rows.groupBy(_._1._1)
    for (((cw, age), (nAct, rev, cum, cu, ltv)) <- rows) {
      val (refAct, refRev) = cells((cw, age))
      assert(nAct == refAct && rev == refRev, s"cell ($cw,$age) drifted")
      assert(cu == size(cw), s"cohort size drifted for $cw")
      val refCum = cells.collect { case ((c, a), (_, r)) if c == cw && a <= age => r }.sum
      assert(cum == refCum, s"cumulative drifted at ($cw,$age)")
      val refLtv =
        ((BigInt(refCum) * 20000 + BigInt(size(cw)) * 100) /
          (BigInt(size(cw)) * 200)).toDouble / 10000.0
      assert(ltv == refLtv, s"ltv drifted at ($cw,$age)")
    }
    // the curve is non-decreasing in age within every cohort (order
    // totals are positive)
    for ((_, rs) <- byCohort) {
      val byAge = rs.sortBy(_._1._2).map(_._2._3)
      assert(byAge.zip(byAge.drop(1)).forall { case (a, b) => a <= b }, "LTV curve decreased")
    }
    // fixture is non-vacuous: multiple cohorts, multiple ages, revenue > 0
    assert(byCohort.size > 1 && rows.map(_._1._2).distinct.length > 1 &&
      rows.map(_._2._2).sum > 0, "fixture does not exercise the curve")
  }

  test("autocorr: per-user lag-1/7 Pearson matches an exact-sums replay") {
    val rows = Windows.autocorr(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(
        col("user_id").isNotNull && col("ts").isNotNull && col("value").isNotNull &&
          !isnan(col("value")) && abs(col("value")) <= 5.0e6)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
        floor(col("value") * 100.0).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def r4(x: Double) =
      BigDecimal.valueOf(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def acf(cs: Array[Long], k: Int): Option[Double] = {
      val pairs = cs.dropRight(k).zip(cs.drop(k))
      val m = pairs.length
      if (m < 2) None
      else {
        val sx = pairs.map(p => BigInt(p._1)).sum
        val sy = pairs.map(p => BigInt(p._2)).sum
        val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
        val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
        val syy = pairs.map(p => BigInt(p._2) * p._2).sum
        val vx = m.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
        val vy = m.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
        if (vx > 0 && vy > 0)
          Some(r4((m.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
            (math.sqrt(vx) * math.sqrt(vy))))
        else None
      }
    }
    val ref = ev.groupBy(_._1).map { case (u, obs) =>
      val cs = obs.sortBy(o => (o._2, o._3)).map(_._4)
      u -> ((cs.length.toLong, acf(cs, 1), acf(cs, 7)))
    }
    assert(rows.length == ref.size)
    for (r <- rows) {
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      val got = (r.getLong(1), opt(2), opt(3))
      assert(got == ref(r.getLong(0)), s"acf drift for user ${r.getLong(0)}: " +
        s"$got vs ${ref(r.getLong(0))}")
    }
    assert(rows.exists(r => !r.isNullAt(2) && !r.isNullAt(3)), "fixture yields no defined acf")
  }

  test("rfm: quartile scores match an exact NTILE replay and segments follow the CASE") {
    val rows = Windows.rfm(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))).toMap
    assert(rows.nonEmpty)
    val base = graft.sources.Tables.orders(spark, sfDir)
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull &&
        col("o_totalprice").isNotNull)
      .groupBy(col("o_custkey"))
      .agg(max(expr("unix_date(cast(o_orderdate as date))").cast("long")).as("r"),
        count(lit(1)).as("f"),
        sum(floor(col("o_totalprice") * 100.0).cast("long")).as("m"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // exact NTILE(4) semantics over ascending (value, cust)
    def quart(vals: Seq[(Long, Long)]): Map[Long, Int] = {
      val sorted = vals.sortBy { case (v, c) => (v, c) }
      val n = sorted.length
      val (q, rem) = (n / 4, n % 4)
      sorted.zipWithIndex.map { case ((_, c), i) =>
        val tile =
          if (i < rem * (q + 1)) i / (q + 1) + 1
          else rem + (i - rem * (q + 1)) / q + 1
        c -> tile
      }.toMap
    }
    val rq = quart(base.map(b => (b._2, b._1)))
    val fq = quart(base.map(b => (b._3, b._1)))
    val mq = quart(base.map(b => (b._4, b._1)))
    assert(rows.size == base.length)
    for ((c, r, f, m) <- base) {
      val got = rows(c)
      assert(got._1 == r && got._2 == f && got._3 == m, s"measures drift for cust $c")
      assert(got._4 == rq(c) && got._5 == fq(c) && got._6 == mq(c),
        s"scores drift for cust $c: (${got._4},${got._5},${got._6}) vs " +
          s"(${rq(c)},${fq(c)},${mq(c)})")
      val seg =
        if (got._4 >= 3 && got._5 >= 3 && got._6 >= 3) "champion"
        else if (got._4 >= 3) "recent"
        else if (got._5 >= 3 || got._6 >= 3) "lapsing_valuable"
        else "dormant"
      assert(got._7 == seg, s"segment drift for cust $c")
    }
    // quartiles are balanced: each tile holds n/4 +- 1 customers
    val n = base.length
    for (qmap <- Seq(rq, fq, mq); t <- 1 to 4) {
      val sz = qmap.values.count(_ == t)
      assert(math.abs(sz - n / 4) <= 1, s"tile $t unbalanced: $sz of $n")
    }
    assert(rows.values.map(_._7).toSet.size > 1, "only one segment — CASE unobservable")
  }

  test("trend: a vertical line (all observations on one day) yields NULL fit, not an error") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_trend").toString
    val dayUs = 86400000000L
    // user 1: three observations on one epoch day (den = 0); user 2: a
    // clean two-point line, slope 2.00 $/day through (d0, $10), (d0+1, $12)
    Seq(
      (1L, 10L * dayUs + 100L, 1L, "view", 5.0, "{}"),
      (2L, 10L * dayUs + 200L, 1L, "view", 9.0, "{}"),
      (3L, 10L * dayUs + 86399999999L, 1L, "view", 1.0, "{}"),
      (4L, 20L * dayUs, 2L, "view", 10.0, "{}"),
      (5L, 21L * dayUs, 2L, "view", 12.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = Windows.trend(spark, dir).collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).isNullAt(3) && got(1L).isNullAt(4), "one-day user must have NULL fit")
    assert(got(2L).getDouble(3) == 2.0, "two-point slope")
    // forecast at day_last + 7 = 28: 12 + 7·2 = 26
    assert(got(2L).getDouble(4) == 26.0, "two-point forecast")
  }
}
