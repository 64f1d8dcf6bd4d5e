package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class DedupSpec extends GraftSpecBase {

  test("all dedup/similarity/text queries run and return rows") {
    val all = Dedup.queries ++ Similarity.queries ++ TextAnalysis.queries
    for ((name, fn) <- all) {
      assert(fn(spark, sfDir).count() > 0, s"$name empty")
    }
  }

  test("exact dedup keeps every distinct text exactly once") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val distinctTexts = docs.select("text").distinct().count()
    assert(Dedup.exact(spark, sfDir).count() == distinctTexts)
  }

  test("jaccard values are within [0,1] and sorted desc") {
    val rows = Dedup.ngramJaccard(spark, sfDir).collect().map(_.getAs[Double]("jaccard"))
    assert(rows.forall(j => j >= 0 && j <= 1))
    assert(rows.sameElements(rows.sorted(Ordering[Double].reverse)))
  }

  test("minhash est_jaccard roughly tracks exact jaccard for top pair") {
    // minhash is an estimator; just assert its output schema/range sanity
    val mh = Dedup.minhash(spark, sfDir).collect()
    assert(mh.forall(r => r.getAs[Double]("est_jaccard") >= 0.5))
  }

  test("minhash-detected pairs have genuinely overlapping gram sets") {
    import org.apache.spark.unsafe.types.UTF8String
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def gramSet(t: String): Set[Long] =
      Option(graft.functions.GramHash64.compute(UTF8String.fromString(t)))
        .map(_.toLongArray().toSet).getOrElse(Set.empty)
    val confident = Dedup.minhash(spark, sfDir)
      .filter(col("est_jaccard") >= 0.7).collect()
    assert(confident.nonEmpty, "expected at least one confident minhash pair at sf0.001")
    for (r <- confident) {
      val (a, b) = (gramSet(texts(r.getLong(0))), gramSet(texts(r.getLong(1))))
      val j = a.intersect(b).size.toDouble / a.union(b).size
      assert(j >= 0.3, s"minhash est ${r.getDouble(2)} but true jaccard $j for pair " +
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("simhash pairs have hamming <= 8 and doc_a < doc_b") {
    val sh = Dedup.simhash(spark, sfDir)
    assert(sh.filter(col("hamming") > 8 || col("doc_a") >= col("doc_b")).count() == 0)
  }

  test("simhash verify stage: precision >= 0.5 against the 3-gram truth, recall kept") {
    // the r16 signature-agreement verify's contract (r15 verdict #5):
    // the unverified hamming<=8 pair set measured 612 ppm precision at
    // sf0.1 (182,807 predicted vs 256 true); the verified stage must
    // read at least 50% precise in the engine's own census WITHOUT
    // giving up the bit-criterion's recall (every true pair that shares
    // a block and agrees on the minhash signatures survives the filter)
    val rows = Dedup.dedupRecall(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(4), r.getLong(5))).toMap
    val (nPred, recall, precision) = rows("simhash")
    assert(nPred > 0, "verify stage emptied the simhash pair set — test is vacuous")
    assert(precision >= 500000L, s"simhash precision $precision ppm below the 0.5 floor")
    assert(recall >= 500000L, s"simhash recall $recall ppm collapsed under the verify stage")
  }

  test("ann brute topk: 5 neighbors per query, no self-match, cos desc") {
    val out = Similarity.annBrute(spark, sfDir)
    assert(out.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val badGroups = out.groupBy("query_id").count().filter(col("count") =!= 5).count()
    assert(badGroups == 0)
  }

  test("ann lsh results are a subset-quality approximation of brute force") {
    // every LSH neighbor's cos_sim must be <= the brute-force rank-1 cos for that query
    val brute = Similarity.annBrute(spark, sfDir).filter(col("rk") === 1)
      .select(col("query_id"), col("cos_sim").as("best"))
    val lsh = Similarity.annLsh(spark, sfDir)
    val bad = lsh.join(brute, "query_id").filter(col("cos_sim") > col("best")).count()
    assert(bad == 0)
  }

  test("split_leakage reproduces a driver-side recomputation from pairs x splits") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def splitOf(text: String): String = {
      val b = md5hex(text).substring(0, 3)
      if (b < "ccd") "train" else if (b < "e66") "val" else "test"
    }
    val splits = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> splitOf(Option(r.getString(1)).getOrElse(""))).toMap
    val pairs = Dedup.ngramPairsPlan(spark, sfDir)
      .select("doc_a", "doc_b", "n_inter", "denom").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter { case (_, _, n, d) => 2 * n >= d }
    def ju(n: Long, d: Long): Long = (n / d) * 10000 + (2 * (n % d) * 10000 + d) / (2 * d)
    val leaks = pairs
      .flatMap { case (a, b, n, d) => Seq((a, b, n, d), (b, a, n, d)) }
      .filter { case (doc, p, _, _) =>
        Set("val", "test")(splits(doc)) && splits(p) == "train"
      }
      .groupBy { case (doc, _, _, _) => doc }
      .map { case (doc, ps) =>
        (doc, splits(doc), ps.length.toLong,
          ps.map { case (_, _, n, d) => ju(n, d) }.max / 10000.0)
      }
      .toSet
    val got = Dedup.splitLeakage(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == leaks, s"leak census diverged:\n got=$got\n exp=$leaks")
    // every reported doc is eval-side by construction
    assert(got.forall(r => r._2 == "val" || r._2 == "test"))
  }

  test("lsh bucket split: covers every row in ≤⌈mass/cap⌉ sub-buckets, passes through at 0") {
    import spark.implicits._
    val hot = (1L to 50L).map(i => (i, 0, 0))
    val cold = Seq((10L, 1, 2), (20L, 1, 2))
    val pairs = (hot ++ cold).toDF("vec_id", "t", "b")
    val q = Seq((100L, 0, 0), (101L, 1, 2), (102L, 3, 3)).toDF("query_id", "t", "b")
    // cap=4: hot bucket splits 13 ways, cold stays whole — and the join
    // output is EXACTLY the plain bucket join's row multiset (the split
    // is a task-geometry change, never a candidate filter)
    val salts = Similarity.bucketSaltCounts(pairs, 4)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getInt(2))).toMap
    assert(salts == Map((0, 0) -> 13, (1, 2) -> 1), s"sub-bucket counts wrong: $salts")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val plain = rows(Similarity.saltedBucketJoin(pairs, q, "vec_id", 0))
    val split = rows(Similarity.saltedBucketJoin(pairs, q, "vec_id", 4))
    assert(split == plain && plain.nonEmpty,
      s"split join must preserve the exact candidate multiset: ${split.size} vs ${plain.size}")
    // the per-task bound: no (t, b, salt) group exceeds the cap by more
    // than the mod-placement remainder (ids 1..50 mod 13 spread ≤ 4)
    val groupMax = pairs
      .join(broadcast(Similarity.bucketSaltCounts(pairs, 4)), Seq("t", "b"))
      .groupBy(col("t"), col("b"), pmod(col("vec_id"), col("n_salt").cast("long")))
      .count().agg(max("count")).collect()(0).getLong(0)
    assert(groupMax <= 4, s"sub-bucket group exceeded the cap: $groupMax")
  }

  test("lsh bucket split end-to-end: any cap answers identically to uncapped") {
    def rows() = Similarity.annLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val baseline = rows()
    try {
      for (cap <- Seq("1000000", "32", "1")) {
        spark.conf.set("spark.graft.ann.lshBucketCap", cap)
        assert(rows() == baseline,
          s"split at cap=$cap must be result-identical to uncapped (recall-preserving)")
      }
    } finally spark.conf.set("spark.graft.ann.lshBucketCap", "0")
  }

  test("lsh skew remediation loop: census flags a planted hot bucket, the cap bounds it gracefully") {
    // the census + cap are driver-gated on hash-uniform fixtures (flat
    // census, cap exercised only synthetically); THIS is the clustered
    // deployment they exist for: 240 identical embeddings collapse to
    // ONE sign-pattern bucket per table, the census must flag it, and
    // the census-derived cap must bound that bucket while leaving cold
    // buckets' results untouched (graceful degradation, not emptiness)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_skew").toString
    // hot mass sized to trip the census's heavy-key bar (c > 10x fair
    // share) against the bounded 6x16 bucket domain: that needs the
    // spread population to OCCUPY most of the 96 keys (fair share small)
    // while the hot bucket holds > 10x it — sign-pattern-diverse spread
    // vectors (one distinct +/- pattern per id) cover the domain; 2000
    // hot vs ~90 occupied keys puts the hot bucket at ~13x fair
    val hotN = 2000
    val hot = (0 until hotN).map(i => (1000L + i, "h", Array.fill(8)(0.5f)))
    val spread = (0 until 200).map { i =>
      val id = if (i < 3) (i + 1) * 100L else 400L + i
      (id, "s", Array.tabulate(8)(d => if (((id >> d) & 1L) == 1L) 0.9f else -0.9f))
    }
    (hot ++ spread).toDF("vec_id", "label", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    (1L to 10L).map(i => (i, ("word " * 30).trim + s" doc$i", "en", "fix", 155L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.conf.set("spark.graft.emb.dim", "8")
    try {
      val census = Similarity.skewLshBuckets(spark, dir).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
      val (nRows, nKeys, maxKey, heavy, salt) = census("emb_lsh.(t,b)")
      assert(maxKey >= hotN, s"hot bucket invisible: max_key_rows=$maxKey < $hotN")
      assert(heavy >= 1 && salt >= 4,
        s"census must flag the planted skew: heavy_keys=$heavy salt_factor=$salt")
      def byQuery(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
        df.collect().map(r => (r.getLong(0), r.getDouble(2)))
          .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSeq.sorted.reverse }
      val uncapped = byQuery(Similarity.annLsh(spark, dir))
      assert(uncapped.nonEmpty, "fixture produced no LSH results at all")
      val cap = 2 * (nRows / nKeys).toInt
      // the census-derived cap splits the planted hot bucket into
      // ⌈max/cap⌉ probe-replicated sub-buckets — a real split (≥ 2) ...
      val applied = (maxKey + cap - 1) / cap
      assert(applied >= 2, s"fixture cap $cap does not split the hot bucket (max=$maxKey)")
      spark.conf.set("spark.graft.ann.lshBucketCap", cap.toString)
      val capped = byQuery(Similarity.annLsh(spark, dir))
      // ... and the r15 remediation is recall-PRESERVING: identical
      // results to uncapped, per query, score for score (the r14
      // truncating cap only promised pointwise domination)
      assert(capped == uncapped,
        s"split serving diverged from uncapped on the planted fixture:\n" +
          s" capped=${capped.toSeq.sortBy(_._1).take(3)}…\n" +
          s" uncapped=${uncapped.toSeq.sortBy(_._1).take(3)}…")
    } finally {
      spark.conf.unset("spark.graft.emb.dim")
      spark.conf.set("spark.graft.ann.lshBucketCap", "0")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("ann_recall_clustered: five methods censused, split-capped LSH keeps full recall under skew") {
    val rows = Similarity.annRecallClustered(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("graph", "ivf", "ivfpq", "lsh", "pq"),
      s"census must report every method: ${rows.keySet}")
    val (_, np, ru) = rows("lsh")
    assert(np > 0, "clustered census has no brute anchor pairs")
    // the clustered view drops every cluster member into its query's
    // sign buckets, so plain LSH's candidate set contains the true
    // top-5 — and the operator serves LSH through the census-derived
    // SPLIT cap, so this floor is simultaneously the
    // recall-preservation assertion: the r14 truncating cap would
    // shear cluster mates past the cap and fail it
    assert(ru >= 900000, s"clustered split-capped LSH recall $ru below the 0.9 floor")
  }

  test("er_pairs: every planted transposition recovered, scores exact, matches bounded") {
    val rows = Dedup.erPairs(spark, sfDir).collect()
    assert(rows.nonEmpty, "er_pairs found nothing — fixture is vacuous")
    val byPair = rows.map(r =>
      (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getString(3), r.getInt(4), r.getLong(5), r.getBoolean(6))).toMap
    // planted truth: every variant record (2k+1, from c_custkey % 7 = 3)
    // must pair with its canonical (2k) — the transposition key at the
    // swap position guarantees blocking recall 1.0 by construction
    val customers = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val planted = customers.keys.filter(k => k % 7 == 3).toSeq.sorted
    assert(planted.nonEmpty)
    for (k <- planted) {
      val pair = (2 * k, 2 * k + 1)
      assert(byPair.contains(pair), s"planted variant of customer $k not recovered")
      val (na, nb, lev, simU, same) = byPair(pair)
      assert(same, s"planted pair $pair must flag same_entity")
      // driver replay of the swap + Levenshtein bound: an adjacent
      // transposition is lev 2 when the chars differ, 0 when equal
      val name = customers(k)
      val p = (10 + k % 8).toInt - 1 // 0-based
      val swapped = name.substring(0, p) + name.charAt(p + 1) + name.charAt(p) +
        name.substring(p + 2)
      assert(na == name && nb == swapped, s"pair $pair names ($na, $nb) != ($name, $swapped)")
      val expLev = if (name.charAt(p) == name.charAt(p + 1)) 0 else 2
      assert(lev == expLev, s"pair $pair lev $lev != $expLev")
      assert(simU == (name.length - lev).toLong * 1000000L / name.length)
    }
    // every reported match is within the threshold; a lev-0 pair across
    // two entities IS possible (a planted transposition can collide with
    // another real customer's name — e.g. variant of #31 swaps its last
    // two digits into #13's exact name; realistic dirty-data ambiguity
    // the same_entity column exists to surface) but then the two names
    // must be literally identical
    assert(rows.forall(_.getInt(4) <= 2))
    assert(rows.filter(r => !r.getBoolean(6) && r.getInt(4) == 0)
      .forall(r => r.getString(2) == r.getString(3)),
      "a cross-entity lev-0 pair with differing names is impossible")
  }

  test("clustered recall census: store-served rows identical to scan-time (graft_recall parity)") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // store-served path (builds the graft_recall bodies if stale) …
    val served = rows(Similarity.annRecallClustered(spark, sfDir))
    assert(Similarity.recallStoreFresh(spark, sfDir),
      "annRecallClustered must leave a fresh graft_recall store behind")
    // … must answer exactly what the six live pipelines answer
    val scan = rows(Similarity.annRecallClusteredScan(spark, sfDir))
    assert(served == scan, s"store-served census diverged: served=$served scan=$scan")
    // a warm re-read serves the same rows (parquet round-trip stable)
    assert(rows(Similarity.annRecallClustered(spark, sfDir)) == served)
  }

  test("multi-table lsh recall vs brute-force top-5 is material") {
    val brute = Similarity.annBrute(spark, sfDir).select("query_id", "neighbor_id")
    val lsh = Similarity.annLsh(spark, sfDir).select("query_id", "neighbor_id")
    val hits = lsh.intersect(brute).count()
    val total = brute.count()
    // single-table 8-plane LSH managed ~8% recall on this corpus; the
    // 6-table × 4-plane index must do materially better
    assert(hits * 100 >= total * 30, s"recall ${hits}/${total} below 30%")
  }

  test("ann_recall reproduces a driver-side recomputation from the method outputs") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.annBrute(spark, sfDir))
    val methods = Map(
      "graph" -> pairs(Similarity.annGraph(spark, sfDir)),
      "ivf" -> pairs(Similarity.annIvf(spark, sfDir)),
      "ivfpq" -> pairs(Similarity.annIvfPq(spark, sfDir)),
      "lsh" -> pairs(Similarity.annLsh(spark, sfDir)),
      "pq" -> pairs(Similarity.annPq(spark, sfDir)))
    val got = Similarity.annRecall(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == methods.keySet, s"method rows ${got.keySet}")
    for ((m, ps) <- methods) {
      val hits = (ps & brute).size.toLong
      val expected = (hits, brute.size.toLong, hits * 1000000L / brute.size)
      assert(got(m) == expected, s"$m: got ${got(m)}, recomputed $expected")
    }
    // the composition must agree with the long-standing 30%-LSH-recall bar
    assert(got("lsh")._3 >= 300000L, s"lsh recall_u ${got("lsh")._3}")
  }

  test("corpus_dedup keeps all minhash keepers and drops all condemned docs") {
    val kept = Dedup.corpusDedup(spark, sfDir).select("doc_id")
    val pairs = Dedup.minhash(spark, sfDir)
    // no kept doc may appear as the higher-id member of a near-dup pair
    val violations = kept.join(pairs, kept("doc_id") === pairs("doc_b")).count()
    assert(violations == 0)
    assert(kept.count() > 0)
  }

  test("knn_join: 3 nearest per label centroid") {
    val out = Similarity.knnJoin(spark, sfDir)
    val badGroups = out.groupBy("label").count().filter(col("count") =!= 3).count()
    assert(badGroups == 0)
  }

  test("langid predicts en for english-stopword-rich text") {
    val out = TextAnalysis.langid(spark, sfDir)
    // the synthetic corpus is english-ish word salad; at least half should score en
    val en = out.filter(col("pred_lang") === "en").count()
    assert(en > out.count() / 2)
  }

  test("fingerprint md5 matches between fingerprint and exact dedup hashing") {
    val fp = TextAnalysis.fingerprint(spark, sfDir).select(col("content_md5")).distinct().count()
    val de = Dedup.exact(spark, sfDir).count()
    assert(fp == de)
  }

  test("dedup_clusters: reps self-map, exact dups co-cluster, sizes consistent") {
    val out = Dedup.dedupClusters(spark, sfDir).persist()
    try {
      assert(out.filter(col("cluster_id") > col("doc_id")).count() == 0,
        "cluster_id must be the minimum member id")
      val reps = out.select(col("cluster_id")).distinct()
      val selfMapped = out.filter(col("doc_id") === col("cluster_id")).select(col("cluster_id"))
      assert(reps.exceptAll(selfMapped).count() == 0,
        "every cluster's representative must be a member mapping to itself")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), md5(col("text")).as("h"))
      val split = docs.join(out, "doc_id").groupBy("h")
        .agg(countDistinct("cluster_id").as("k")).filter(col("k") > 1).count()
      assert(split == 0, "exact duplicates ended up in different clusters")
      val sz = out.groupBy("cluster_id").count()
      assert(out.join(sz, "cluster_id").filter(col("cluster_size") =!= col("count")).count() == 0,
        "cluster_size disagrees with actual membership")
    } finally out.unpersist()
  }

  test("dedup_clusters converges fast on a long near-dup chain (path-halving)") {
    // 60 sliding windows stepping 2 over a shared word sequence: adjacent
    // docs overlap 9 of their 11 words (Jaccard ~0.6 ≥ 0.5), docs two
    // apart fall below threshold — a pure chain of diameter ~60. Linear
    // propagation would need ~60 rounds and trip the 50-round loud guard;
    // path-halving must finish well inside it and still produce ONE
    // cluster rooted at doc 0. Run in BOTH checkpoint modes: the default
    // localCheckpoint and the petabyte-path reliable checkpoint dir.
    val dir = java.nio.file.Files.createTempDirectory("graft_chain").toString
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val words = (0 until 130).map(i => s"w$i")
    val rows = (0L until 60L).map { i =>
      (i, words.slice(2 * i.toInt, 2 * i.toInt + 11).mkString(" "))
    }
    import spark.implicits._
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      for (mode <- Seq(None, Some(ckptDir))) {
        val out = Dedup.dedupClusters(spark, dir, mode).collect()
        assert(out.length == 60, s"mode=$mode")
        assert(out.forall(_.getLong(1) == 0L), s"mode=$mode: chain must collapse into one cluster rooted at 0")
        assert(out.forall(_.getLong(2) == 60L), s"mode=$mode: cluster_size must cover the whole chain")
      }
      val ckptFiles = new java.io.File(ckptDir).listFiles()
      assert(ckptFiles != null && ckptFiles.nonEmpty,
        "reliable mode must have written checkpoint data into the given dir")
      // per-call run_<uuid> namespace: a second call against the SAME dir
      // must land in a fresh subdir, never touching the first call's files
      val out2 = Dedup.dedupClusters(spark, dir, Some(ckptDir)).collect()
      assert(out2.length == 60)
      val runDirs = new java.io.File(ckptDir).listFiles().filter(_.getName.startsWith("run_"))
      assert(runDirs.length == 2,
        s"expected 2 distinct run namespaces after 2 calls, found ${runDirs.length}")
    } finally Dedup.clearSharedCache()
  }

  test("near-dup candidate pipelines stay bounded on a boilerplate mega-cluster") {
    // 1000 NEAR-identical docs — each differs from the shared boilerplate
    // by one trailing word, so the exact-hash stage can NOT absorb them —
    // the web-corpus pathology the hot-key guards exist for. Plus one
    // genuine near-dup pair on a disjoint vocabulary that candidate
    // generation must still find. Unguarded generation emits ~n²/2 ≈ 500k
    // pairs here; all three pipelines must stay orders of magnitude below.
    val dir = java.nio.file.Files.createTempDirectory("graft_mega").toString
    import spark.implicits._
    val base = (0 until 60).map(i => s"common$i").mkString(" ")
    val mega = (0L until 1000L).map(i => (i, s"$base uniq$i"))
    val planted = Seq(
      (5000L, (0 until 11).map(i => s"rare$i").mkString(" ")),
      (5001L, (2 until 13).map(i => s"rare$i").mkString(" ")))
    (mega ++ planted).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("mega"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val quadratic = 1000L * 999 / 2 // ≈ 500k distinct pairs when unguarded
      // ngram DROPS mega-cluster pairs (a df>20 gram is a zero-signal
      // stop-shingle): candidates must collapse to ~the planted pair
      val bound = 20000L
      val ngramCand = Dedup.ngramPairsPlan(spark, dir)
      val nCand = ngramCand.count()
      assert(nCand <= bound, s"ngram candidates $nCand not bounded (unguarded ≈ $quadratic)")
      assert(
        ngramCand
          .filter(col("doc_a") === 5000 && col("doc_b") === 5001 && col("jaccard") >= 0.5)
          .count() == 1,
        "planted near-dup pair lost by the hot-gram guard")
      // minhash STARS mega-cluster buckets (a band collision is 4 agreeing
      // minhash slots — strong signal even when hot): candidate count stays
      // linear, but every member keeps an edge to the bucket representative
      // so the cluster still deduplicates
      val mhCand = Dedup.minhashCandidates(spark, dir).persist()
      try {
        val mCand = mhCand.count()
        assert(mCand <= bound, s"minhash candidates $mCand not bounded (unguarded ≈ $quadratic)")
        assert(
          mhCand.filter(col("doc_a") === 5000 && col("doc_b") === 5001).count() == 1,
          "planted near-dup pair lost by the hot-band guard")
        val starReached = mhCand.filter(col("doc_b") < 1000).select("doc_b").distinct().count()
        assert(starReached >= 900,
          s"star pairing reached only $starReached/999 mega members — hot-band guard dropping near-dups")
      } finally mhCand.unpersist()
      // end-to-end: the minhash materializer must collapse the mega-cluster
      // to representatives, not keep all 1000 near-identical docs
      val kept = Dedup.corpusDedup(spark, dir).count()
      assert(kept <= 100, s"mega-cluster not collapsed: $kept of 1002 docs kept")
      // simhash splinters the mega-cluster across many just-under-cap
      // buckets (swing bits from the unique word) and legitimately REPORTS
      // those pairs — its guard's guarantee is per-bucket work ≤ cap and
      // total output ≤ blockRows × cap/2: linear in corpus size, below the
      // deduped unguarded quadratic
      val shPairs = Dedup.simhash(spark, dir).count()
      val shBound = 4L * 1002 * Dedup.blockDfCap / 2
      assert(shPairs <= shBound, s"simhash pairs $shPairs above linear bound $shBound")
      assert(shBound < quadratic, "fixture too small to discriminate the simhash bound")
    } finally Dedup.clearSharedCache()
  }

  test("ngram pipeline never plans an unbounded collect (capped native aggregate only)") {
    // the guard's whole point is that a df=10⁸ stop-shingle costs ≤ 21
    // buffered longs, never a 10⁸-element collect_list buffer — pin that
    // the only collect in the pipeline is the capped native aggregate
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList}
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val plan = Dedup.ngramPairsPlan(spark, sfDir).queryExecution.optimizedPlan
    val unbounded = plan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(_.exists {
            case ae: AggregateExpression => ae.aggregateFunction.isInstanceOf[CollectList]
            case _ => false
          }) =>
        a
    }
    assert(unbounded.isEmpty, s"unbounded collect_list crept back in:\n$plan")
    val capped = plan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(_.exists {
            case ae: AggregateExpression =>
              ae.aggregateFunction.isInstanceOf[graft.functions.CappedLongCollect]
            case _ => false
          }) =>
        a
    }
    assert(capped.nonEmpty, s"capped collect aggregate missing from:\n$plan")
  }

  test("winnow_pairs rides the capped-collect candidate engine + partial top-k") {
    // same rarePairCounts engine as the ngram pipeline (the capped-collect
    // spec above pins its state bound); here pin that the fingerprint
    // variant actually routes through it and cuts top-20 partially
    val physical = Dedup.winnowPairs(spark, sfDir).queryExecution.executedPlan.toString
    assert(physical.contains("graft_collect_capped"),
      s"winnow pairs not on the capped candidate engine:\n$physical")
    assert(physical.contains("TakeOrderedAndProject"),
      s"top-20 not a partial top-k:\n$physical")
    val rows = Dedup.winnowPairs(spark, sfDir).collect()
    assert(rows.length <= 20)
    // the known sf0.001 near-dup family must collide on fingerprints too
    assert(rows.nonEmpty, "expected at least one fingerprint-overlap pair at sf0.001")
  }

  test("ngram bucket aggregation: one scan, map-side partials, no stragglers") {
    // the round-5/6 straggler shipped a hot gram's every occurrence to
    // one reducer (count + semi-join), and the round-6 plan silently paid
    // a second corpus scan for its count branch. Pin the capped-collect
    // shape that deletes all of it: (1) ONE documents scan, pruned to
    // (doc_id, text) — doc_id stays because the loud packing-envelope
    // assert reads it — (2) the gram aggregation's PARTIAL mode runs
    // below its exchange (map-side combine: a hot gram crosses the wire
    // as one count + ≤ 21 longs per task, never raw occurrences).
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Partial, PartialMerge}
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Dedup.clearSharedCache()
      val plan = Dedup.ngramPairsPlan(spark, sfDir).queryExecution.executedPlan
      val scans = plan.collect { case f: FileSourceScanExec => f.schema.fieldNames.toSet }
      assert(scans.size == 1, s"documents scanned ${scans.size} times (want 1):\n$plan")
      assert(scans.head.subsetOf(Set("doc_id", "text")),
        s"documents scan not pruned to (doc_id, text), read ${scans.head}:\n$plan")
      val gramPartialBelowExchange = plan.collect {
        case e: ShuffleExchangeExec if e.child.collectFirst {
              case h: BaseAggregateExec
                  if h.aggregateExpressions.exists(a =>
                    a.mode == Partial || a.mode == PartialMerge) &&
                    h.groupingExpressions.map(_.name) == Seq("gram") =>
                h
            }.isDefined =>
          e
      }
      assert(gramPartialBelowExchange.nonEmpty,
        s"gram aggregation does not combine map-side (straggler regressed):\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      Dedup.clearSharedCache()
    }
  }

  test("source_overlap accounts for every near-dup pair exactly once, triangle-ordered") {
    val m = Dedup.sourceOverlap(spark, sfDir)
    val rows = m.collect()
    assert(rows.nonEmpty)
    // every matrix cell is lexicographically ordered (one triangle)
    assert(rows.forall(r => r.getString(0) <= r.getString(1)),
      "matrix cell with source_a > source_b")
    // jaccard range sane and within the materializer predicate band
    assert(rows.forall { r =>
      val mn = r.getDouble(3); val mx = r.getDouble(4)
      mn >= 0.5 && mn <= mx && mx <= 1.0
    })
    // the matrix is a complete partition of the >= 0.5 pair set: summed
    // cells equal the pair frame's own count (no pair dropped by the
    // source joins, none double-counted by the least/greatest fold)
    val total = rows.map(_.getLong(2)).sum
    val expected = Dedup
      .ngramPairsPlan(spark, sfDir)
      .filter(col("jaccard") >= 0.5)
      .count()
    assert(total == expected, s"matrix total $total != pair frame $expected")
  }

  test("ivf dedup finds the exact top near-dup pairs through cell-bounded pairing") {
    val ivf = Similarity.ivfDedup(spark, sfDir).collect()
    assert(ivf.length <= 20 && ivf.nonEmpty)
    assert(ivf.forall(r => r.getLong(0) < r.getLong(1)), "vec_a >= vec_b")
    val sims = ivf.map(_.getDouble(3))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "not cos-desc")
    // recall vs the exact all-pairs ground truth: near-identical vectors
    // score near-identically against every centroid, so planted near-dups
    // co-cell except at boundaries
    val exact = Dedup
      .embeddingPairs(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val got = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall vs exact top-20 too low: $recall")
  }

  test("ivf dedup cell-population guard fails loudly, not quadratically") {
    spark.conf.set("spark.graft.dedup.ivfCellCap", "1")
    try {
      val e = intercept[Exception] {
        Similarity.ivfDedup(spark, sfDir).count()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
      assert(messages(e).exists(m => m != null && m.contains("ivfCellCap")),
        s"guard tripped without its message: $e")
    } finally spark.conf.set("spark.graft.dedup.ivfCellCap", "100000")
  }

  test("shared pairs cache refreshes when the documents table changes on disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stale").toString
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      docs.filter(col("doc_id") < 100).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val first = Dedup.ngramJaccard(spark, dir).collect()
      assert(first.forall(_.getLong(0) < 100))
      // replace the table in place with a DISJOINT doc_id range: a stale
      // cache hit would keep returning pairs from the old corpus
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 400).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val second = Dedup.ngramJaccard(spark, dir).collect()
      assert(second.nonEmpty && second.forall(_.getLong(0) >= 100),
        "cache served results from the replaced corpus")
    } finally Dedup.clearSharedCache() // the shared session outlives this suite
  }

  test("survivorship's drop set is exactly the materializer's complement") {
    val docs = graft.sources.Tables.documents(spark, sfDir).select("doc_id")
    val dropped = Dedup.survivorship(spark, sfDir).select("doc_id").distinct()
    val survivors = Dedup.corpusDedupNg(spark, sfDir).select("doc_id")
    // partition: every doc is dropped xor survives, none both, none lost
    assert(dropped.intersect(survivors).count() == 0,
      "a doc reported dropped also survived the materializer")
    assert(dropped.count() + survivors.count() == docs.count(),
      "survivorship + survivors must partition the corpus")
    assert(dropped.count() > 0, "fixture has no dups — test is vacuous")
  }

  test("minhash candidates recall the exact Jaccard >= 0.5 relation") {
    // ground truth re-derived brute-force from raw text (string grams,
    // rare band, full-count Jaccard — no shared code with the operator);
    // measures the one approximation pair not otherwise quality-pinned:
    // banded minhash candidate generation vs the exact near-dup relation.
    // Measured 28/28 on this corpus (near-identical template dups land
    // reliably in a shared band); floor set conservatively at 80%.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .flatMap(r => Option(r.getAs[String]("text")).map(t => r.getAs[Long]("doc_id") -> t))
    val gramSets = docs.map { case (id, t) =>
      val words = t.trim.replaceAll(" +", " ").split(" ").filter(_.nonEmpty)
      id -> (if (words.length < 3) Set.empty[String]
             else words.sliding(3).map(_.mkString(" ")).toSet)
    }.toMap
    val df = gramSets.values.flatten.groupBy(identity).map { case (g, o) => g -> o.size }
    val rare = df.collect { case (g, c) if c >= 2 && c <= 20 => g }.toSet
    val wg = gramSets.filter(_._2.nonEmpty).toSeq.sortBy(_._1)
    val exact = (for {
      (a, ga) <- wg; (b, gb) <- wg
      if a < b
      ni = (ga & gb).count(rare)
      if ni > 0 && ni.toDouble / (ga.size + gb.size - ni) >= 0.5
    } yield (a, b)).toSet
    assert(exact.nonEmpty, "fixture has no near-dup pairs — recall test is vacuous")
    val cand = Dedup.minhashCandidates(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = (exact & cand).size
    assert(hit * 100 >= exact.size * 80,
      s"minhash recall $hit/${exact.size} below 80% — banding params drifted")
  }
}
