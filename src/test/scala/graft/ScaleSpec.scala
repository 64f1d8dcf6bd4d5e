package graft

import graft.operators.{CorpusOps, Relational, Scale, Similarity, TextAnalysis, Windows}
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

  test("IVF executes at most two embeddings file scans") {
    // centroid pass + assignment pass read the files; the query sample
    // feeds BOTH the probe list and the rescoring vectors from one
    // persisted frame (InMemoryTableScan), not two more corpus scans —
    // the r4 verdict's 4-scan finding must not regress. (The cache's
    // populate pass is a third runtime read hidden inside the
    // InMemoryRelation — this test pins the PLAN-visible scan count,
    // i.e. that neither consumer re-reads the files per-query.) AQE is
    // disabled for the assertion so ReuseExchange collapses the
    // duplicated codebook broadcast at planning time (AQE does the same
    // reuse, but only at runtime, which a static plan inspection can't
    // see).
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    // cold-cache precondition: another operator's warm PipelineCache
    // frame (e.g. emb_kmeans' quantized corpus) would be substituted by
    // the CacheManager into annIvf's scan subtrees and shift both counts
    graft.operators.PipelineCache.clear()
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Similarity.annIvf(spark, sfDir).queryExecution.executedPlan
      val fileScans = plan.collect { case f: FileSourceScanExec => f }
      assert(fileScans.size <= 2,
        s"embeddings scanned ${fileScans.size} times (want ≤ 2) in:\n$plan")
      val cacheScans = plan.collect { case c: InMemoryTableScanExec => c }
      assert(cacheScans.size == 2,
        s"probes + rescore must both read the persisted query sample, got ${cacheScans.size} in:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
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

  // ---- Scale.globalRank: exact-rank property + edge cases + plan shape ----

  private def rankFixture(n: Int) = {
    // deterministic, no RNG: negative values, heavy skew (1/3 of rows share
    // one value), collisions across groups — ties must resolve by the id
    // tiebreaker identically to a plain window row_number
    spark
      .range(n)
      .select(
        (col("id") % 7).as("g"),
        when(col("id") % 3 === 0, lit(7L))
          .otherwise(pmod(hash(col("id")), lit(100)) - 50)
          .cast("long")
          .as("v"),
        col("id"))
  }

  private def assertRankMatches(
      df: org.apache.spark.sql.DataFrame,
      buckets: Int,
      boundsOf: Option[org.apache.spark.sql.DataFrame] = None,
      quantileBounds: Boolean = false): Unit = {
    val got = Scale
      .globalRank(df, Seq("g"), col("v"), Seq(col("v"), col("id")),
        buckets = buckets, boundsOf = boundsOf, quantileBounds = quantileBounds)
      .select("g", "id", "__rn", "__n")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val want = df
      .withColumn("__rn", row_number().over(w.orderBy(col("v"), col("id"))).cast("long"))
      .withColumn("__n", count(lit(1)).over(w))
      .select("g", "id", "__rn", "__n")
    assert(got.count() == df.count(), "globalRank dropped or duplicated rows")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "globalRank disagrees with window row_number")
  }

  test("globalRank equals row_number under skew, negatives and tie-heavy data") {
    assertRankMatches(rankFixture(5000), buckets = 16)
  }

  test("globalRank survives the degenerate hi==lo range (all values equal)") {
    val df = spark.range(500).select(lit(0L).as("g"), lit(42L).as("v"), col("id"))
    assertRankMatches(df, buckets = 8)
  }

  test("globalRank handles more buckets than rows") {
    assertRankMatches(rankFixture(10), buckets = 256)
  }

  test("globalRank fails loudly on NULL bucketOn instead of dropping rows") {
    val df = spark
      .range(100)
      .select(lit(0L).as("g"), when(col("id") === 50, lit(null)).otherwise(col("id")).as("v"), col("id"))
    val e = intercept[Exception] {
      Scale.globalRank(df, Seq("g"), col("v"), Seq(col("v"), col("id"))).count()
    }
    assert(e.getMessage.contains("bucketOn is NULL"), s"wrong error: ${e.getMessage}")
  }

  test("globalRank ranks exactly across the full Long value span") {
    // spans near 2^63 used to overflow exact-long bucketing; the all-double
    // monotone bucket must rank these correctly, not reject or corrupt them
    val df = spark
      .range(100)
      .select(
        (col("id") % 3).as("g"),
        (col("id") * lit(Long.MaxValue / 100) - lit(Long.MaxValue / 2)).as("v"),
        col("id"))
    assertRankMatches(df, buckets = 16)
  }

  test("globalRank stays exact when boundsOf under-covers the data (outliers)") {
    val df = spark
      .range(1000)
      .select(lit(0L).as("g"),
        when(col("id") === 999, lit(Long.MaxValue / 2)).otherwise(col("id")).as("v"),
        col("id"))
    assertRankMatches(df, buckets = 256, boundsOf = Some(df.filter(col("v") < 500)))
  }

  test("globalRank quantile mode stays exact under pathological value skew") {
    // 90% of values crowd [0,100) while stragglers reach ~1e11 — fixed-width
    // buckets put ~all rows in bucket 0; quantile boundaries must still
    // produce exact ranks (and balanced buckets, which this can't observe
    // directly — correctness is the contract, balance the motivation)
    val df = spark
      .range(10000)
      .select(
        (col("id") % 4).as("g"),
        when(col("id") % 10 < 9, col("id") % 100)
          .otherwise(col("id") * lit(10000000L)).as("v"),
        col("id"))
    assertRankMatches(df, buckets = 32, quantileBounds = true)
  }

  test("globalRank property: exact for generated distributions (both bucket modes)") {
    // generator-based sweep with a FIXED seed (reproducible runs): random
    // group counts, value ranges spanning sign changes, duplicate-heavy
    // multipliers — both bucketing modes must agree with window row_number
    // on every draw
    import org.scalacheck.rng.Seed
    import org.scalacheck.Gen
    val gen = for {
      n <- Gen.choose(1, 800)
      groups <- Gen.choose(1, 9)
      valMod <- Gen.choose(2L, 5000L) // small modulus → many ties
      shift <- Gen.choose(-1000000L, 1000000L)
      buckets <- Gen.oneOf(1, 2, 7, 64, 300)
      quantile <- Gen.oneOf(true, false)
    } yield (n, groups, valMod, shift, buckets, quantile)
    var seed = Seed(42L)
    for (_ <- 1 to 8) {
      val (n, groups, valMod, shift, buckets, quantile) =
        gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val df = spark
        .range(n)
        .select(
          (col("id") % groups).as("g"),
          (pmod(hash(col("id")), lit(valMod)) + shift).cast("long").as("v"),
          col("id"))
      withClue(s"n=$n groups=$groups valMod=$valMod shift=$shift buckets=$buckets quantile=$quantile: ") {
        assertRankMatches(df, buckets = buckets, quantileBounds = quantile)
      }
    }
  }

  test("globalRank fails loudly on an empty bounds frame instead of returning nothing") {
    val df = rankFixture(100)
    val e = intercept[Exception] {
      Scale
        .globalRank(df, Seq("g"), col("v"), Seq(col("v"), col("id")),
          boundsOf = Some(df.filter(lit(false))))
        .count()
    }
    assert(e.getMessage.contains("bounds frame is empty"), s"wrong error: ${e.getMessage}")
  }

  test("win_ntile computes the orders-customer join once (exchange reuse)") {
    val df = Windows.ntileQuartiles(spark, sfDir)
    df.collect() // AQE finalizes stage reuse only at execution
    val finalPlan = df.queryExecution.executedPlan
      .collectFirst { case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan }
      .getOrElse(df.queryExecution.executedPlan)
    val s = finalPlan.toString
    val customerScans = "customer.parquet".r.findAllIn(s).size
    assert(customerScans == 1, s"customer scanned $customerScans times:\n$s")
    // orders: once through the join + once in the narrow bounds scan
    val ordersScans = "orders.parquet".r.findAllIn(s).size
    assert(ordersScans <= 2, s"orders scanned $ordersScans times — ranked branch not reused:\n$s")
    assert(s.contains("ReusedExchange"), s"no exchange reuse in:\n$s")
  }

  test("no full-table window partitions on a single low-cardinality key") {
    // the scale-killer this guards against: row_number() over
    // Window.partitionBy(<5-value column>) directly on a fact table puts
    // ~1/5 of the table through one task's sort. Phase-1 windows must key
    // on (__pid/__bkt, group); a single-key window is only legal above a
    // barrier (Aggregate or another Window) that already shrank the frame.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window => LWindow}
    val highCard = Set("user_id", "query_id", "doc_id", "event_id", "id")
    def scanBelowWithoutBarrier(p: LogicalPlan): Boolean = p match {
      case _: Aggregate | _: LWindow => false
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => true
      case other => other.children.exists(scanBelowWithoutBarrier)
    }
    // quantileBkt: a __bkt-ONLY window is accepted for this entry —
    // legal ONLY for rankers that bucket with quantileBounds = true
    // (boundaries are observed percentiles, so each bucket holds
    // ~1/256 of the frame REGARDLESS of value skew). Fixed-width
    // rankers don't get the pass: their balance premise is value
    // uniformity, exactly what this guard distrusts.
    for (
      (name, df, quantileBkt) <- Seq(
        ("win_topk", Windows.topkPerType(spark, sfDir), false),
        ("win_ntile", Windows.ntileQuartiles(spark, sfDir), false),
        ("win_anomaly", Windows.anomaly(spark, sfDir), false),
        ("win_rolling_median", Windows.rollingMedian(spark, sfDir), false),
        ("text_quality_calibration",
          graft.operators.TextAnalysis.qualityCalibration(spark, sfDir), true),
        ("sample_stratified", graft.operators.Sampling.stratified(spark, sfDir), false))
    ) {
      val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(windows.nonEmpty, s"$name: expected window nodes")
      for (w <- windows if w.children.exists(scanBelowWithoutBarrier)) {
        val partNames = w.partitionSpec.flatMap(_.references.map(_.name))
        val bktOk = quantileBkt && partNames.nonEmpty && partNames.forall(_ == "__bkt")
        assert(
          partNames.size >= 2 || partNames.exists(highCard) || bktOk,
          s"$name: full-table window partitioned only by ${partNames.mkString(",")} — single-task sort at scale")
      }
    }
  }

  test("split_leakage: candidate-bounded equi-joins only — no cartesian, no window") {
    val qe = graft.operators.Dedup.splitLeakage(spark, sfDir).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"leak census must never pair splits cartesianly:\n$plan")
    // the pair frame is the only fan-out; everything downstream is
    // doc_id equi-joins + one grouped aggregate — a window here would
    // mean a global sort crept into a corpus-proportional path
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    assert(qe.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
      "split_leakage must stay window-free")
  }

  // ---- CorpusOps: plan shapes the 100 TB story depends on ----

  test("contamination never shuffles the corpus: broadcast gram join, one pair exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan =
        graft.operators.CorpusOps.contamination(spark, sfDir).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"eval gram set not broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"corpus-side shuffle join crept in:\n$plan")
      // span reporting rolls up in two aggregations (per-matched-gram,
      // then per-pair) — both exchanges carry matched rows only
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges <= 2,
        s"expected only the two matched-pair aggregates to hash-exchange, got $exchanges:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dedup_incremental prunes the gram stream with a broadcast semi-join UNDER the gate") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // the STANDALONE (cold-cache) shape is the one under test — a warm
    // shared ngram frame would legitimately switch to the index-reuse path
    graft.operators.Dedup.clearSharedCache()
    try {
      val plan = graft.operators.CorpusOps
        .dedupIncremental(spark, sfDir)
        .queryExecution.executedPlan.toString
      // within the size gate (default 2M delta grams) the delta-gram prune
      // is hinted broadcast: it must survive even with auto-broadcast off,
      // and sit on the map side (a LeftSemi BHJ), so only delta-present
      // gram rows ever reach the wide exchange
      assert("BroadcastHashJoin .*LeftSemi".r.findFirstIn(plan).isDefined,
        s"delta-gram prune not a broadcast semi-join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dedup_incremental ABOVE the gate: no delta-gram broadcast, same rows") {
    // an oversized batch must degrade to a linear shuffle semi-join — the
    // unconditional broadcast was the one plan in the repo that could not
    // survive its own 100 TB design point
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    graft.operators.Dedup.clearSharedCache()
    try {
      val under = graft.operators.CorpusOps.dedupIncremental(spark, sfDir).collect().toSeq
      spark.conf.set("spark.graft.corpus.deltaGramBroadcastMax", "0")
      graft.operators.Dedup.clearSharedCache()
      val df = graft.operators.CorpusOps.dedupIncremental(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"delta-gram prune still broadcasts above the gate:\n$plan")
      assert(plan.contains("LeftSemi"), s"gram prune lost its semi-join shape:\n$plan")
      assert(df.collect().toSeq == under, "gated fallback changed the admitted batch")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.unset("spark.graft.corpus.deltaGramBroadcastMax")
      graft.operators.Dedup.clearSharedCache()
    }
  }

  test("indexed admission probes the index by broadcast only under the gate") {
    val idx = java.nio.file.Files.createTempDirectory("graft_idx_gate").toString + "/idx"
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.operators.GramIndex.build(spark, sfDir, idx)
      val under = graft.operators.CorpusOps
        .dedupIncrementalIndexed(spark, sfDir, idx, buildIfStale = false)
      assert(under.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "delta probes not broadcast under the gate")
      val rowsUnder = under.collect().toSeq
      spark.conf.set("spark.graft.corpus.deltaGramBroadcastMax", "0")
      val over = graft.operators.CorpusOps
        .dedupIncrementalIndexed(spark, sfDir, idx, buildIfStale = false)
      assert(!over.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "index probe still broadcasts above the gate")
      assert(over.collect().toSeq == rowsUnder, "gated probe fallback changed the admitted batch")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.unset("spark.graft.corpus.deltaGramBroadcastMax")
    }
  }

  test("text_tfidf scans documents once — the df branch reuses the tf exchange") {
    val df = graft.operators.TextAnalysis.tfidf(spark, sfDir)
    df.collect() // AQE finalizes stage reuse only at execution
    val finalPlan = df.queryExecution.executedPlan
      .collectFirst { case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan }
      .getOrElse(df.queryExecution.executedPlan)
    val s = finalPlan.toString
    // corpus cost: ONE text scan (tf); the N-count branch prunes to a
    // columnless scan and the df branch must re-read the tf EXCHANGE,
    // never the corpus
    val textScans = "ReadSchema: struct<doc_id:bigint,text:string>".r.findAllIn(s).size
    assert(textScans == 1, s"tf scan duplicated — df branch not reusing the exchange:\n$s")
    assert(s.contains("ReusedExchange"), s"no exchange reuse in:\n$s")
  }

  test("graph ops ride the shared pair cache — iterations never rescan the corpus") {
    // deterministic regardless of suite order: clear, then warm the pair
    // frame the way any earlier dedup query would have
    graft.operators.Dedup.clearSharedCache()
    graft.operators.Dedup.ngramJaccard(spark, sfDir).collect()
    import org.apache.spark.sql.execution.FileSourceScanExec
    // AQE off so the static plan exposes scan nodes to collect() (the
    // IVF pin's discipline — ASPE hides its subtree pre-execution)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try for ((name, df) <- Seq(
        "pagerank" -> graft.operators.Graph.pagerank(spark, sfDir),
        "triangles" -> graft.operators.Graph.triangles(spark, sfDir))) {
      val plan = df.queryExecution.executedPlan
      assert(plan.toString.contains("InMemoryTableScan"),
        s"$name not reading the cached pair frame:\n$plan")
      // pagerank's N count is an eager pre-job; the iterating plan
      // itself must carry ZERO file scans (lineage doubles per round —
      // any lazy corpus subtree would be replicated 2^Iters times; the
      // InMemoryRelation's printed child mentions documents.parquet, so
      // count actual scan NODES, not plan-string mentions)
      val fileScans = plan.collect { case f: FileSourceScanExec => f }
      assert(fileScans.isEmpty,
        s"$name rescans files (${fileScans.size}) despite a warm pair cache:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("percent-of-total queries scan their fact table once (window total, not a branch)") {
    for ((name, df, table) <- Seq(
        ("q1_seg_pct", Relational.q1SegPct(spark, sfDir), "orders.parquet"),
        ("q2_topnation_share", Relational.q2TopNationShare(spark, sfDir), "orders.parquet"))) {
      val plan = df.queryExecution.executedPlan.toString
      val scans = table.r.findAllIn(plan).size
      assert(scans == 1, s"$name scanned $table $scans times — total branch crept back:\n$plan")
    }
  }

  test("LSH executes at most two embeddings file scans (cached query sample)") {
    // the IVF pin's discipline: cold cache + AQE off so the static plan
    // exposes scan nodes; both query-side consumers must ride the
    // persisted sample (InMemoryTableScan), not re-scan the corpus
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    graft.operators.PipelineCache.clear()
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Similarity.annLsh(spark, sfDir).queryExecution.executedPlan
      val fileScans = plan.collect { case f: FileSourceScanExec => f }
      assert(fileScans.size <= 2,
        s"embeddings scanned ${fileScans.size} times (want ≤ 2) in:\n$plan")
      val cacheScans = plan.collect { case c: InMemoryTableScanExec => c }
      assert(cacheScans.size == 2,
        s"bucket probe + rescore must both read the persisted query sample, got ${cacheScans.size} in:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("text_search_bm25: two corpus scans, census broadcast back, no cartesian blow-up") {
    val plan = graft.operators.TextAnalysis.searchBm25(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = "documents.parquet".r.findAllIn(plan).size
    assert(scans == 2, s"bm25 scanned documents $scans times (want 2 — doc frame + census):\n$plan")
    // the 1-row census joins back as a broadcast, never a shuffled join
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"census must broadcast back:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"bm25 plan contains a cartesian:\n$plan")
  }

  test("er_pairs: candidate generation is key-equality under the df band — no cartesian") {
    val plan = graft.operators.Dedup.erPairs(spark, sfDir).queryExecution.executedPlan
    val planStr = plan.toString
    assert(!planStr.contains("CartesianProduct"),
      s"er_pairs plan contains a cartesian:\n$planStr")
    assert(!planStr.contains("BroadcastNestedLoopJoin"),
      s"er_pairs plan contains a nested-loop join:\n$planStr")
    // no window over the record set anywhere (blocking is groupBy/join)
    assert(!planStr.contains("Window"),
      s"er_pairs plan sorts records through a window:\n$planStr")
  }

  test("lm_bigram: two corpus scans — head counts are window totals, not a third branch") {
    // 2, not 1: the zip_with lambda below the shared exchange defeats
    // canonicalization, so the census chain and the final join can't
    // share a scan; the window rewrite removed the third (c1) branch
    val plan =
      graft.operators.TextAnalysis.lmBigram(spark, sfDir).queryExecution.executedPlan.toString
    val scans = "documents.parquet".r.findAllIn(plan).size
    assert(scans == 2, s"lm_bigram scanned documents $scans times (want 2):\n$plan")
  }

  test("emb_drift: one embeddings scan — global centroid is window totals, not a branch") {
    val plan =
      graft.operators.Similarity.drift(spark, sfDir).queryExecution.executedPlan.toString
    val scans = "embeddings.parquet".r.findAllIn(plan).size
    assert(scans == 1, s"drift scanned embeddings $scans times — global branch crept back:\n$plan")
  }

  test("ts_interpolate: all four flanking windows share one sort, no output sort") {
    val plan =
      graft.operators.Windows.interpolate(spark, sfDir).queryExecution.executedPlan.toString
    // ONE (user, day) sort under the whole window stack — a second sort
    // would mean either the prev/next windows re-sorted the frame or a
    // corpus-sized presentation orderBy crept back into the operator
    val sorts = "\\bSort \\[".r.findAllIn(plan).size
    assert(sorts == 1, s"expected the shared window-stack sort only, got $sorts:\n$plan")
  }

  test("data_split assignment plans zero hash exchanges (narrow map + output sort only)") {
    val plan =
      graft.operators.CorpusOps.dataSplit(spark, sfDir).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 0, s"split assignment must not shuffle:\n$plan")
  }

  test("ts_ohlc: one hash exchange — rank windows and the aggregate share the cell partitioning") {
    val plan =
      graft.operators.Windows.ohlc(spark, sfDir).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"ohlc should shuffle once on the (day, type) cell key:\n$plan")
  }

  test("emb_kmeans: centroids broadcast, shuffles are k-row aggregates only") {
    val plan =
      graft.operators.Similarity.embKmeans(spark, sfDir).queryExecution.executedPlan.toString
    // assignment must be a narrow map against the broadcast codebook —
    // one BroadcastNestedLoopJoin per Lloyd round, never an n×k shuffle
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size == 2,
      s"expected 2 broadcast codebook joins:\n$plan")
    // the only hash exchanges are the two k-row centroid/output groupBys
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 3, s"corpus-sized shuffle in kmeans plan ($exchanges exchanges):\n$plan")
  }

  test("gapfill: every window is user-partitioned (no unpartitioned calendar sort)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = Windows.gapfill(spark, sfDir)
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected the forward-fill window")
    for (w <- windows) {
      val partNames = w.partitionSpec.flatMap(_.references.map(_.name))
      assert(
        partNames.contains("user_id"),
        s"gapfill window partitioned by ${partNames.mkString(",")} — a global calendar sort at scale")
    }
  }

  test("corpus_mix joins the corpus by broadcast: rates move, the corpus never shuffles") {
    val plan =
      graft.operators.CorpusOps.corpusMix(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rates not broadcast:\n$plan")
    // the only hash exchanges allowed are the tiny per-language count
    // aggregations (≤ |langs| rows each) — never a corpus-sized one
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"corpus-sized shuffle in mix plan ($exchanges exchanges):\n$plan")
  }

  test("lm_score vocabulary join consumes aggregates, never raw exploded occurrences") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, Join, LogicalPlan}
    val df = graft.operators.TextAnalysis.lmScore(spark, sfDir)
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    val tokJoins = joins.filter(_.condition.exists(_.references.exists(_.name == "tok")))
    assert(tokJoins.nonEmpty, "expected the vocabulary join on tok")
    // a Generate (explode) reachable without crossing an Aggregate means
    // per-OCCURRENCE rows reach the join — the skew shape the operator
    // exists to avoid
    def generateAboveAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: Generate  => true
      case other        => other.children.exists(generateAboveAggregate)
    }
    for (j <- tokJoins; c <- j.children)
      assert(!generateAboveAggregate(c), s"raw exploded occurrences reach the tok join:\n$j")
  }

  test("lm_bigram census join consumes aggregates, never raw exploded occurrences") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, Join, LogicalPlan}
    val df = TextAnalysis.lmBigram(spark, sfDir)
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    val bgJoins = joins.filter(_.condition.exists(_.references.exists(_.name == "bigram")))
    assert(bgJoins.nonEmpty, "expected the census join on bigram")
    def generateAboveAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: Generate  => true
      case other        => other.children.exists(generateAboveAggregate)
    }
    for (j <- bgJoins; c <- j.children)
      assert(!generateAboveAggregate(c), s"raw exploded occurrences reach the bigram join:\n$j")
  }

  test("text_search ranks via TakeOrdered, never a global sort") {
    val plan = graft.operators.TextAnalysis.search(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected partial top-k ranking:\n$plan")
    assert(
      !"Exchange rangepartitioning".r.findFirstIn(plan).isDefined,
      s"global sort in search plan:\n$plan")
  }

  test("basket_pairs: top-20 via TakeOrdered, one broadcast lift pass over the part counts") {
    val plan = graft.operators.Analytics.basketPairs(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected partial top-k cut:\n$plan")
    // the melted ≤40-row probe set broadcasts against ONE pass of the
    // part counts — a part-count shuffle join would move catalog-sized
    // frames for a 20-row answer
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 1, s"lift join not broadcast:\n$plan")
    // exactly one part-count aggregate: the old two-join chain executed
    // the explode+count subtree once per side
    assert("partial_count".r.findAllIn(plan).size <= 3,
      s"part-count subtree duplicated:\n$plan")
  }

  test("agg_moments: partial aggregation below the exchange (one 5-key shuffle)") {
    val plan = graft.operators.Analytics.moments(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    // the power sums must combine map-side: a partial-mode aggregate
    // appears below the single hash exchange on mktsegment
    assert("partial_sum".r.findFirstIn(plan).isDefined, s"no map-side partial agg:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      s"moments should shuffle the join + one agg only:\n$plan")
  }

  test("date_growth: the lag window runs above the quarter aggregate, never the fact scan") {
    val plan = graft.operators.Analytics.dateGrowth(spark, sfDir)
      .queryExecution.executedPlan.toString
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.indexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx >= 0, plan)
    // tree prints parents first: the (unpartitioned) window must sit ABOVE
    // the aggregate, i.e. its input is the |quarters| frame, not orders
    assert(winIdx < aggIdx, s"window should consume the aggregated frame:\n$plan")
  }

  test("emb_quantize is a narrow map: zero hash exchanges, one scan") {
    val plan =
      graft.operators.Similarity.embQuantize(spark, sfDir).queryExecution.executedPlan.toString
    assert(
      "Exchange hashpartitioning".r.findAllIn(plan).isEmpty,
      s"quantization must not shuffle:\n$plan")
    val scans = "embeddings.parquet".r.findAllIn(plan).size
    assert(scans == 1, s"embeddings scanned $scans times:\n$plan")
  }

  test("batch_drift census is ONE corpus scan: window totals, no re-aggregate branch") {
    // a totals branch re-reading per_lang would duplicate the documents
    // scan under column pruning (the exchange-reuse trap); the window
    // formulation is one-scan by construction
    val plan =
      graft.operators.CorpusOps.batchDrift(spark, sfDir).queryExecution.executedPlan.toString
    val scans = "documents.parquet".r.findAllIn(plan).size
    assert(scans == 1, s"documents scanned $scans times:\n$plan")
  }

  test("text_pii is a narrow map: zero hash exchanges, no joins") {
    val plan =
      graft.operators.TextAnalysis.pii(spark, sfDir).queryExecution.executedPlan.toString
    assert(
      "Exchange hashpartitioning".r.findAllIn(plan).isEmpty,
      s"pii scrub must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"pii scrub must not join:\n$plan")
    val scans = "documents.parquet".r.findAllIn(plan).size
    assert(scans == 1, s"documents scanned $scans times:\n$plan")
  }

  test("conversion_time plans grouped aggregates only — no window, no cartesian") {
    val plan =
      Windows.conversionTime(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window crept into the funnel-latency plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
  }

  test("len_outliers: every downstream read rides the cached histogram, zero re-scans") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = TextAnalysis.lenOutliers(spark, sfDir).queryExecution.executedPlan
      val fileScans = plan.collect { case f: FileSourceScanExec => f }
      assert(fileScans.isEmpty,
        s"corpus re-scanned ${fileScans.size} times instead of riding the histogram cache:\n$plan")
      val cacheScans = plan.collect { case c: InMemoryTableScanExec => c }
      assert(cacheScans.size >= 3,
        s"expected the median/MAD/census branches to read the cached histogram, got ${cacheScans.size}:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      graft.operators.Dedup.clearSharedCache()
    }
  }

  test("boilerplate: three corpus scans (census, positional, cut), no more") {
    val plan =
      graft.operators.CorpusOps.boilerplate(spark, sfDir).queryExecution.executedPlan.toString
    val scans = "documents.parquet".r.findAllIn(plan).size
    assert(scans == 3, s"documents scanned $scans times (want 3):\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    // the census must be a count-only aggregate — a collect over a
    // corpus-wide hot gram would be the unbounded-buffer hazard
    assert(!plan.contains("collect_list"), s"unbounded collect in census:\n$plan")
  }

  test("ivf dedup: one assignment pass shared via cache, cell equi-join, no all-pairs") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      graft.operators.Dedup.clearSharedCache()
      val plan = Similarity.ivfDedup(spark, sfDir).queryExecution.executedPlan
      val str = plan.toString
      assert(!str.contains("CartesianProduct"), s"cartesian in:\n$str")
      // the k-cosines-per-vector assignment runs ONCE (inside the cached
      // slim frame's populate pass); plan-visible embeddings scans are
      // only the two vector re-joins — a third would mean a consumer
      // regressed to replaying the assignment
      val fileScans = plan.collect { case f: FileSourceScanExec => f }
      assert(fileScans.size <= 2,
        s"embeddings scanned ${fileScans.size} times (want ≤ 2):\n$str")
      val cacheScans = plan.collect { case c: InMemoryTableScanExec => c }
      assert(cacheScans.size >= 3,
        s"both join sides + the guard must read the cached assignment, got ${cacheScans.size}:\n$str")
      assert(str.contains("TakeOrderedAndProject"), s"expected partial top-k ranking:\n$str")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      graft.operators.Dedup.clearSharedCache()
    }
  }

  test("winsorized: ONE segment exchange feeds rank sort, threshold windows and rollup") {
    val plan =
      graft.operators.Analytics.winsorized(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dimension join must broadcast:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected one mktsegment shuffle shared by windows + rollup, got $exchanges:\n$plan")
  }

  test("win_paths: user-sorted leads + bounded census, cut by TakeOrdered not a global sort") {
    val plan =
      graft.operators.Windows.paths(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-10 must be a partial top-k:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2,
      s"expected the user window exchange + the |types|^3 census only, got $exchanges:\n$plan")
  }

  test("ts_twap: the user rollup rides the lead window's exchange (one shuffle total)") {
    val plan =
      graft.operators.Windows.twap(spark, sfDir).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"groupBy(user_id) must reuse the window's user partitioning, got $exchanges:\n$plan")
  }

  test("q21_sole_late: one fact scan, one orderkey exchange + the supplier census only") {
    val plan =
      graft.operators.Relational.q21SoleLate(spark, sfDir).queryExecution.executedPlan.toString
    // the aggregate-and-join-back form re-derived the join+aggregate
    // lineage on both sides (2 lineitem scans, 5 exchanges); the
    // window-verdict form is pinned at one lineage
    val scans = "FileScan parquet \\[l_orderkey".r.findAllIn(plan).size
    assert(scans == 1, s"lineitem scanned $scans times:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2,
      s"expected the explicit ok exchange + the supplier census, got $exchanges:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-10 must be a partial top-k:\n$plan")
  }

  test("sample_exact_k is a fan-in-bounded TakeOrdered, never a global sort or shuffle") {
    val plan =
      graft.operators.Sampling.exactK(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected partial top-k:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty,
      s"exact-k sample must not shuffle the data:\n$plan")
    // the merge-point fan-in bound: a shuffle-free Coalesce below the
    // TakeOrdered re-heaps scan partitions in groups, so the single
    // merge sees ≤ k·fanIn rows at any corpus partition count
    assert(plan.contains("Coalesce"), s"expected the fan-in Coalesce stage:\n$plan")
    // the knob genuinely narrows the tree (and rows are unchanged)
    spark.conf.set("spark.graft.sample.exactKFanIn", "2")
    try {
      val narrow = graft.operators.Sampling.exactK(spark, sfDir)
      assert(narrow.queryExecution.executedPlan.toString.contains("Coalesce 2"),
        "fan-in knob ignored")
      spark.conf.unset("spark.graft.sample.exactKFanIn")
      val wide = graft.operators.Sampling.exactK(spark, sfDir)
      assert(narrow.collect().map(_.getLong(0)).toSeq ==
        wide.collect().map(_.getLong(0)).toSeq,
        "fan-in must not change the sampled rows")
    } finally spark.conf.unset("spark.graft.sample.exactKFanIn")
  }

  test("json_extract_agg and ts_active_users scans read only their needed columns") {
    def readSchema(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
        .split("\n").filter(_.contains("ReadSchema")).mkString
    val js = readSchema(Windows.jsonExtract(spark, sfDir))
    for (c <- Seq("event_type", "props")) assert(js.contains(c), s"missing $c in $js")
    for (c <- Seq("value", "user_id", "event_id")) assert(!js.contains(c), s"unpruned $c in $js")
    val au = readSchema(Windows.activeUsers(spark, sfDir))
    for (c <- Seq("user_id", "ts")) assert(au.contains(c), s"missing $c in $au")
    for (c <- Seq("value", "props", "event_type")) assert(!au.contains(c), s"unpruned $c in $au")
  }

  test("win_ema: 21 lags ride one window sort and one user exchange, no output sort") {
    val plan =
      graft.operators.Windows.ema(spark, sfDir).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one user exchange, got $exchanges:\n$plan")
    // ONE window-frame sort — more would mean the lag terms fragmented
    // into several window operators or a corpus-sized presentation
    // orderBy crept back into the operator
    val sorts = "\\bSort \\[".r.findAllIn(plan).size
    assert(sorts == 1, s"expected the window sort only, got $sorts:\n$plan")
  }

  test("no corpus-proportional output ever plans a global sort (presentation family)") {
    // every query whose presentation order moved into the Verify dump
    // must plan WITHOUT a range-partition exchange — the physical
    // signature of a global orderBy. This pins the round-9 discipline:
    // output ∝ input ⇒ the operator ships unsorted, the dump sorts.
    val offenders = SparkEntry.presentationOrder.keys.toSeq.sorted.flatMap { name =>
      val plan = SparkEntry
        .queries(name)(spark, sfDir)
        .queryExecution
        .executedPlan
        .toString
      if ("rangepartitioning".r.findFirstIn(plan).isDefined) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"global presentation sorts crept back into: $offenders")
    graft.operators.Dedup.clearSharedCache()
  }

  test("ts_features: daily rollup and both range windows share ONE user exchange") {
    val plan =
      graft.operators.Windows.features(spark, sfDir).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected the explicit user repartition to be the only shuffle, got $exchanges:\n$plan")
  }

  test("quality model: weight table broadcasts, scoring pays one balanced feature shuffle") {
    graft.operators.Dedup.clearSharedCache()
    // the pin inspects the scan-time APPLY plan (what the quality
    // store's build executes); the registry query itself reads the
    // store's scored body and has no join to pin
    val plan = graft.operators.TextAnalysis
      .qualityModelScan(spark, sfDir).queryExecution.executedPlan.toString
    // the ≤4097-row weight table joins by BROADCAST (the 100 TB apply
    // path: model ships to the data, never the reverse) — a sort-merge
    // join here would shuffle the corpus-sized feature frame by bucket
    assert(plan.contains("BroadcastHashJoin"), s"weight join not broadcast in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus-sized sort-merge join in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    graft.operators.Dedup.clearSharedCache()
  }

  test("langid model: the 4-class weight table broadcasts into the trigram feature scan") {
    graft.operators.Dedup.clearSharedCache()
    // the scan-time APPLY (what the quality store's v2 build executes):
    // the ≤ 4·4097-row dense class table must BROADCAST — a sort-merge
    // join would shuffle the corpus-sized trigram feature frame by bucket
    val plan = graft.operators.TextAnalysis
      .lidModelScan(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"class-weight join not broadcast in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus-sized sort-merge join in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    graft.operators.Dedup.clearSharedCache()
  }

  test("ann_chunk_topk: query set broadcasts, ranking never sorts a corpus-sized partition") {
    graft.operators.Dedup.clearSharedCache()
    val df = graft.operators.Similarity.annChunk(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the bounded query side broadcasts into the chunk scan (scoring is
    // one pass over chunks), and the only nested loop is that broadcast
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nlj <= 1, s"unexpected nested loops ($nlj) in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    // two-phase top-k: the window sort must be preceded by the local
    // (__pid, query) rank so no task sorts |docs| rows per query — pinned
    // by requiring BOTH window passes to survive in the plan
    val windows = "Window".r.findAllIn(plan).size
    assert(windows >= 2, s"partial-top-k phase lost (windows=$windows) in:\n$plan")
    graft.operators.Dedup.clearSharedCache()
  }

  test("round-15 operators: banded pairs only, no cartesian, narrow tokenize maps") {
    import graft.operators.{Multimodal, Similarity, TextAnalysis}
    // mm_near_dup: candidates come from the 4-block banding equi-join —
    // never an all-pairs expansion over the media grain
    val nd = Multimodal.nearDup(spark, sfDir).queryExecution.executedPlan.toString
    assert(!nd.contains("CartesianProduct"), s"media near-dup paired cartesianly:\n$nd")
    assert(!nd.contains("BroadcastNestedLoopJoin"), s"unbounded nested loop in:\n$nd")
    // ann_recall_clustered: six pipelines, and the only pair spaces are
    // the DECLARED bounded broadcasts (brute anchor, walk entries) —
    // an unhinted cartesian anywhere is a corpus x corpus regression
    val rc = Similarity.annRecallClustered(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!rc.contains("CartesianProduct"), s"clustered census went cartesian:\n$rc")
    // unigram apply: a narrow codegen'd map — no joins; the only
    // exchange is balancedDocs' conditional rebalance
    val tu = TextAnalysis.tokensUnigram(spark, sfDir).queryExecution.executedPlan.toString
    assert(!tu.contains("Join"), s"unigram apply grew a join:\n$tu")
    assert("Exchange".r.findAllIn(tu).size <= 1,
      s"unigram apply grew shuffles beyond the reader rebalance:\n$tu")
  }

  test("mm family: decode is a narrow map — mm_features plans zero shuffles") {
    val plan = graft.operators.Multimodal
      .features(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in the decode pipeline:\n$plan")
    // mm_dedup adds the content-hash groupBy; countDistinct(format)
    // plans Spark's canonical TWO-phase distinct aggregate (partial on
    // (hash, format) → exchange → merge → hash exchange) — both stages
    // map-side combined, both keyed on the hash, so the pin is ≤ 2
    // exchanges and zero joins
    val dplan = graft.operators.Multimodal
      .mediaDedup(spark, sfDir).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(dplan).size
    assert(exchanges <= 2, s"content-hash rollup grew extra shuffles ($exchanges):\n$dplan")
    assert(!dplan.contains("Join"), s"unexpected join in the hash rollup:\n$dplan")
  }
}
