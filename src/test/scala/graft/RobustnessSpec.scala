package graft

import org.apache.spark.sql.functions._

/** Pathological-input sweep: every registered query must COMPLETE on a
  * corpus containing the degenerate document shapes a real crawl
  * delivers: NULL text, empty text, whitespace-only text, single-word
  * docs, a giant single token, NULL lang/source, and duplicate content
  * across the special sources the corpus-lifecycle operators key on
  * (src0 = eval, src19 = delta). The harness is deliberately STRICT —
  * any throw fails the sweep; none of this fixture's shapes should trip
  * an intentional guard (those fire on scale hazards, not data shape).
  * If a future fixture legitimately trips a documented loud guard, add
  * an explicit expected-failure entry rather than loosening the catch.
  * The driver-generated tables are clean by construction, so this is
  * the coverage they cannot give. */
class RobustnessSpec extends GraftSpecBase {

  private lazy val patDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pathological").toString
    // every non-documents table rides along unchanged (sf0.001)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings"))
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    import spark.implicits._
    val normal = (1 to 40).map { i =>
      (i.toLong, s"normal document number $i with several plain words inside",
        Seq("en", "de", "es", "fr", "zh")(i % 5), s"src${i % 20}", 48L)
    }
    val pathological = Seq(
      (100L, null.asInstanceOf[String], "en", "src1", 0L),   // NULL text
      (101L, "", "en", "src2", 0L),                          // empty text
      (102L, "   ", "en", "src3", 3L),                       // whitespace only
      (103L, "word", "en", "src4", 4L),                      // single word
      (104L, "two words", null, "src5", 9L),                 // NULL lang
      (105L, "three little words", "de", null, 18L),         // NULL source
      (106L, "x" * 5000, "en", "src6", 5000L),               // one giant token
      (107L, "normal document number 7 with several plain words inside",
        "en", "src0", 48L),                                  // eval dup of doc 7
      (108L, "normal document number 9 with several plain words inside",
        "en", "src19", 48L),                                 // delta dup of doc 9
      (109L, "eval only sentence for containment checks here", "en", "src0", 46L),
      (110L, "brand new delta content never seen before anywhere", "fr", "src19", 50L))
    (normal ++ pathological)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("PipelineCache: a cached build may itself read another cached frame (reentrancy)") {
    // regression for the probabilistic "Recursive update" driver crash:
    // packIdsRaw's build reads the cached merge table, spanExcise's
    // regions build reads the cached gram frame — a nested
    // ConcurrentHashMap.compute threw whenever the two keys shared a
    // hash bin (keyed on the session's identity hash, so it surfaced
    // randomly across JVMs). The monitor-based critical section must
    // re-enter cleanly no matter how the keys hash.
    import spark.implicits._
    import graft.operators.PipelineCache
    val dir = java.nio.file.Files.createTempDirectory("graft_nested_cache").toString
    Seq((1L, "stamp carrier")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    // many outer tags so a regression to bin-sensitive behavior has many
    // chances to collide with the inner key
    for (k <- 1 to 32) {
      val outer = PipelineCache.cached(s"nest_outer_$k", spark, dir, "documents.parquet") {
        val inner = PipelineCache.cached("nest_inner", spark, dir, "documents.parquet")(
          Seq(41L).toDF("x"))
        inner.withColumn("y", org.apache.spark.sql.functions.col("x") + 1)
      }
      assert(outer.collect().map(_.getLong(1)).toSeq == Seq(42L))
    }
    graft.operators.Dedup.clearSharedCache()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("PipelineCache: builds for DISTINCT tags run concurrently (per-key locks)") {
    // deterministic non-timing proof: thread A's build BLOCKS on a latch
    // that only thread B's build releases. Under round 10's single
    // global monitor this deadlocks (B cannot enter cached() while A
    // holds the monitor); per-key locks let B's distinct-tag build run
    // and release A. Timeout-guarded so a regression fails loudly
    // instead of hanging the suite.
    import graft.operators.PipelineCache
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_conc_cache").toString
    Seq((1L, "stamp carrier")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val latch = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val a = pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = {
          val df = PipelineCache.cached("conc_a", spark, dir, "documents.parquet") {
            assert(latch.await(30, java.util.concurrent.TimeUnit.SECONDS),
              "distinct-tag build blocked: cached() regressed to a global lock")
            Seq(1L).toDF("x")
          }
          df.count()
        }
      })
      // give A time to take its per-key lock before B starts
      Thread.sleep(300)
      val b = pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = {
          val df = PipelineCache.cached("conc_b", spark, dir, "documents.parquet") {
            latch.countDown()
            Seq(2L).toDF("x")
          }
          df.count()
        }
      })
      assert(b.get(60, java.util.concurrent.TimeUnit.SECONDS) == 1L)
      assert(a.get(60, java.util.concurrent.TimeUnit.SECONDS) == 1L)
    } finally {
      pool.shutdownNow()
      graft.operators.Dedup.clearSharedCache()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("every registered query survives a pathological corpus") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, Throwable)]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try { fn(spark, patDir).count(): Unit }
      catch { case t: Throwable => failures += ((name, t)) }
    }
    graft.operators.Dedup.clearSharedCache()
    assert(
      failures.isEmpty,
      failures.map { case (n, t) => s"$n: ${t.getClass.getSimpleName} ${t.getMessage}" }
        .mkString("queries crashed on pathological input:\n", "\n", ""))
  }

  /** The relational-side sibling of [[patDir]] — the fourth fixture,
    * covering the TPC-H-ish tables the first three sweeps ride along
    * unchanged: orders with NULL custkey / status / priority / date,
    * NULL and NEGATIVE totalprice; lineitem with NULL orderkey /
    * partkey, NULL and negative quantity/price, a discount > 1 and a
    * NULL shipdate; customer with NULL nationkey / name / mktsegment
    * and a negative balance. Clean driver tables can never exercise the
    * NULL-key join paths, CASE fall-throughs and cents-cast NULLs these
    * shapes hit. */
  private lazy val patRelDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pathological_rel").toString
    for (t <- Seq("region", "nation", "supplier", "part", "events", "documents", "embeddings"))
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s0: String) = Timestamp.valueOf(s0)
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val badOrders = Seq(
      (900001L, null.asInstanceOf[java.lang.Long], "O", java.lang.Double.valueOf(1000.0),
        ts("2024-01-01 00:00:00"), "1-URGENT"),                      // NULL custkey
      (900002L, java.lang.Long.valueOf(1L), null.asInstanceOf[String],
        java.lang.Double.valueOf(2000.0), ts("2024-01-02 00:00:00"), "2-HIGH"), // NULL status
      (900003L, java.lang.Long.valueOf(2L), "F", null.asInstanceOf[java.lang.Double],
        ts("2024-01-03 00:00:00"), null.asInstanceOf[String]),       // NULL price + priority
      (900004L, java.lang.Long.valueOf(3L), "O", java.lang.Double.valueOf(-500.0),
        null.asInstanceOf[Timestamp], "9-BOGUS"))                    // negative price, NULL date, unknown priority
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    o.unionByName(badOrders.select(o.columns.map(col): _*))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val badLines = Seq(
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(1L), 1L, 1,
        java.lang.Double.valueOf(1.0), java.lang.Double.valueOf(10.0),
        java.lang.Double.valueOf(0.05), java.lang.Double.valueOf(0.02), "N", "O",
        ts("2024-01-01 00:00:00")),                                  // NULL orderkey
      (java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long], 2L, 2,
        null.asInstanceOf[java.lang.Double], null.asInstanceOf[java.lang.Double],
        java.lang.Double.valueOf(1.5), java.lang.Double.valueOf(0.0),
        null.asInstanceOf[String], "F", null.asInstanceOf[Timestamp]), // NULL part/qty/price/flag/date, discount>1
      (java.lang.Long.valueOf(2L), java.lang.Long.valueOf(3L), 3L, 3,
        java.lang.Double.valueOf(-4.0), java.lang.Double.valueOf(-100.0),
        java.lang.Double.valueOf(0.0), java.lang.Double.valueOf(0.0), "R", "F",
        ts("2024-01-05 00:00:00")))                                  // negative qty/price
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
    l.unionByName(
        badLines
          .withColumn("l_suppkey", col("l_suppkey").cast("long"))
          .select(l.columns.map(col): _*))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    val badCust = Seq(
      (900001L, null.asInstanceOf[String], null.asInstanceOf[java.lang.Integer],
        java.lang.Double.valueOf(-10.0), null.asInstanceOf[String]))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    c.unionByName(badCust.select(c.columns.map(col): _*))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    dir
  }

  test("every registered query survives pathological relational tables") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, Throwable)]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try { fn(spark, patRelDir).count(): Unit }
      catch { case t: Throwable => failures += ((name, t)) }
    }
    graft.operators.Dedup.clearSharedCache()
    assert(
      failures.isEmpty,
      failures.map { case (n, t) => s"$n: ${t.getClass.getSimpleName} ${t.getMessage}" }
        .mkString("queries crashed on pathological relational tables:\n", "\n", ""))
  }

  /** The events-side sibling of [[patDir]]: the stream shapes a real
    * event pipeline delivers and the driver-generated table cannot —
    * NULL timestamp / user / type / value, NaN and ±huge values,
    * IDENTICAL timestamps (the tie-break path), a single-event user and
    * a single-day user. Raw parquet carries ts as INT64 nanos exactly
    * like the driver's table (Tables.events does the DIV-1000
    * conversion). */
  private lazy val patEventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pathological_ev").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings"))
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    import spark.implicits._
    val dayNs = 86400L * 1000000000L
    val t0 = 1767225600L * 1000000000L // 2026-01-01 UTC in ns
    def ns(day: Int, sec: Int): java.lang.Long = java.lang.Long.valueOf(t0 + day * dayNs + sec * 1000000000L)
    val normal = (1 to 30).map { i =>
      (i.toLong, ns(i % 5, i * 60), java.lang.Long.valueOf(1L + i % 3),
        Seq("view", "click", "purchase", "signup", "error")(i % 5),
        java.lang.Double.valueOf(i * 1.25), s"""{"k":$i}""")
    }
    val pathological = Seq(
      (200L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(1L), "view",
        java.lang.Double.valueOf(1.0), "{}"),                      // NULL ts
      (201L, ns(0, 0), null.asInstanceOf[java.lang.Long], "click",
        java.lang.Double.valueOf(2.0), null.asInstanceOf[String]), // NULL user + props
      (202L, ns(0, 1), java.lang.Long.valueOf(2L), null.asInstanceOf[String],
        java.lang.Double.valueOf(3.0), "{}"),                      // NULL type
      (203L, ns(0, 2), java.lang.Long.valueOf(2L), "view",
        null.asInstanceOf[java.lang.Double], "{}"),                // NULL value
      (204L, ns(0, 3), java.lang.Long.valueOf(2L), "view",
        java.lang.Double.valueOf(Double.NaN), "{}"),               // NaN value
      (205L, ns(0, 4), java.lang.Long.valueOf(2L), "view",
        java.lang.Double.valueOf(-1.0e12), "{}"),                  // huge negative
      (206L, ns(1, 0), java.lang.Long.valueOf(3L), "view",
        java.lang.Double.valueOf(1.0), "{}"),                      // tie pair a
      (207L, ns(1, 0), java.lang.Long.valueOf(3L), "click",
        java.lang.Double.valueOf(2.0), "{}"),                      // tie pair b (same ts)
      (208L, ns(9, 0), java.lang.Long.valueOf(99L), "purchase",
        java.lang.Double.valueOf(5.0), "{}"))                      // single-event user
    (normal ++ pathological)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** The vector-side sibling: embedding shapes a real feature pipeline
    * delivers — NULL vector, empty vector, wrong dimensionality (shorter
    * and longer than the corpus's 64), NaN / Infinity components, an
    * all-zero vector (cosine denominator 0) and a NULL label. */
  private lazy val patEmbDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pathological_emb").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents"))
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def boxed(xs: Seq[Float]): Seq[java.lang.Float] = xs.map(java.lang.Float.valueOf)
    val normal = (0 until 40).map { i =>
      (i.toLong, boxed(Seq.fill(64)(rnd.nextFloat() * 2f - 1f)), Integer.valueOf(i % 10))
    }
    val pathological = Seq(
      (100L, null.asInstanceOf[Seq[java.lang.Float]], Integer.valueOf(1)), // NULL vector
      (101L, boxed(Seq.empty), Integer.valueOf(2)),                   // empty vector
      (102L, boxed(Seq.fill(8)(0.5f)), Integer.valueOf(3)),           // too short
      (103L, boxed(Seq.fill(128)(0.25f)), Integer.valueOf(4)),        // too long
      (104L, boxed(Seq.fill(64)(Float.NaN)), Integer.valueOf(5)),     // NaN components
      (105L, boxed(Seq.fill(64)(Float.PositiveInfinity)), Integer.valueOf(6)), // Inf components
      (106L, boxed(Seq.fill(64)(0f)), Integer.valueOf(7)),            // all-zero (|v| = 0)
      (107L, boxed(Seq.fill(64)(0.75f)), null.asInstanceOf[Integer]), // NULL label
      (108L, java.lang.Float.valueOf(1f) +: null.asInstanceOf[java.lang.Float] +:
        boxed(Seq.fill(62)(0.5f)), Integer.valueOf(8)))               // NULL element
    (normal ++ pathological)
      .toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<FLOAT>) AS embedding",
        "CAST(label AS INT) AS label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("every registered query survives a pathological embeddings table") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, Throwable)]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try { fn(spark, patEmbDir).count(): Unit }
      catch { case t: Throwable => failures += ((name, t)) }
    }
    graft.operators.Dedup.clearSharedCache()
    assert(
      failures.isEmpty,
      failures.map { case (n, t) => s"$n: ${t.getClass.getSimpleName} ${t.getMessage}" }
        .mkString("queries crashed on pathological embeddings:\n", "\n", ""))
  }

  test("every registered query survives a pathological events stream") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, Throwable)]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try { fn(spark, patEventsDir).count(): Unit }
      catch { case t: Throwable => failures += ((name, t)) }
    }
    graft.operators.Dedup.clearSharedCache()
    assert(
      failures.isEmpty,
      failures.map { case (n, t) => s"$n: ${t.getClass.getSimpleName} ${t.getMessage}" }
        .mkString("queries crashed on pathological events:\n", "\n", ""))
  }

  test("corrupt media payloads are quarantined, never fatal") {
    import graft.operators.Multimodal
    val w = 20; val h = 10
    val goodPng = Multimodal.Enc.png(w, h, Multimodal.Content.imagePixels(7L, w, h))
    val goodWav = Multimodal.Enc.wav(Multimodal.Content.audioSamples(7L))
    val corrupt = Seq(
      Multimodal.MediaIn(90L, "png", goodPng.take(20)), // truncated mid-IHDR
      Multimodal.MediaIn(91L, "png", goodWav), // mislabeled container
      Multimodal.MediaIn(92L, "wav", Array.fill[Byte](50)(42)), // garbage bytes
      Multimodal.MediaIn(93L, "pgm", "P6\nnot binary gray\n".getBytes("US-ASCII")),
      Multimodal.MediaIn(94L, "wav", Array.emptyByteArray))
    val batch = Seq(
      Multimodal.MediaIn(1L, "png", goodPng),
      Multimodal.MediaIn(2L, "wav", goodWav)) ++ corrupt
    val feats = Multimodal.MediaDecoder.decodeBatch(batch)
    assert(feats.map(_.doc_id).sorted == Seq(1L, 2L),
      s"corrupt rows must drop, valid rows must survive: ${feats.map(_.doc_id)}")
    assert(feats.find(_.doc_id == 1L).get.width == w)
    val resized = Multimodal.Resizer.resizeBatch(batch)
    assert(resized.map(_.doc_id).sorted == Seq(1L, 2L), s"resizer: ${resized.map(_.doc_id)}")
    // the y4m sampler quarantines a wrong-geometry stream too
    val vid = Multimodal.Enc.y4m(16, 16, (0 until 8).map(Multimodal.Content.framePixels(7L, _)))
    val badVid = Multimodal.Enc.y4m(8, 8, Seq(Array.fill[Byte](64)(42)))
    val frames = Multimodal.FrameSampler.sampleBatch(Seq(
      Multimodal.MediaIn(1L, "y4m", vid),
      Multimodal.MediaIn(90L, "y4m", badVid),
      Multimodal.MediaIn(91L, "y4m", goodWav)))
    assert(frames.map(_.doc_id).distinct == Seq(1L), s"sampler: ${frames.map(_.doc_id).distinct}")
  }

  test("jpeg marker walk tolerates T.81 fill bytes and standalone TEM markers") {
    import graft.operators.Multimodal
    val w = 16; val h = 8
    val payload = Multimodal.Enc.jpeg(w, h, Multimodal.Content.imagePixels(3L, w, h))
    val (cw, ch2, clean) = Multimodal.Dec.jpeg(payload)
    // ITU T.81 B.1.1.2: any number of 0xFF FILL bytes may precede a
    // marker — a real media lake contains such streams even though the
    // JDK encoder emits none; the walk must not misparse the second
    // 0xFF as a marker byte and land mid-segment
    val filled = payload.take(2) ++ Array(0xff.toByte) ++ payload.drop(2)
    val (fw, fh, fr) = Multimodal.Dec.jpeg(filled)
    assert((fw, fh) == ((cw, ch2)) && java.util.Arrays.equals(fr, clean),
      "a fill byte before a marker must not change the decode")
    // standalone TEM (0xFF 0x01) carries no length segment; the walk
    // must step over it without consuming phantom length bytes. ImageIO
    // itself may reject TEM-bearing streams — then quarantine is the
    // correct outcome, but the failure must be the codec's verdict, not
    // a walk misparse
    val temmed = payload.take(2) ++ Array(0xff.toByte, 0x01.toByte) ++ payload.drop(2)
    try {
      val (tw, th, tr) = Multimodal.Dec.jpeg(temmed)
      assert((tw, th) == ((cw, ch2)) && java.util.Arrays.equals(tr, clean),
        "a pre-SOF TEM marker must not change the decode")
    } catch {
      case e: Exception =>
        assert(Option(e.getMessage).exists(_.contains("ImageIO")),
          s"TEM handling failed in the marker walk, not the codec: ${e.getMessage}")
    }
    // a SOF truncated right behind a fill run must exit to the walk's
    // CONTROLLED no-SOF verdict — never an uncontrolled index read past
    // the array (the i+9 bound must survive every fill-skip advance)
    val truncated = Array(0xff, 0xd8, 0xff, 0xff, 0xc0, 0, 11, 8, 0, 8, 0).map(_.toByte)
    val err = intercept[Exception](Multimodal.Dec.jpeg(truncated))
    assert(!err.isInstanceOf[ArrayIndexOutOfBoundsException],
      s"truncated-after-fill stream escaped the walk's bounds: $err")
  }

  test("mm_near_dup: cross-quality jpeg re-encodes collide perceptually, never exactly") {
    import graft.operators.Multimodal
    // the dominant real-lake duplicate: the SAME photo re-encoded at two
    // JPEG qualities — decoded bytes differ (different quantization
    // tables), so the exact content hash can never pair them; the dHash
    // gradient structure survives requantization and must
    def jpegAt(w: Int, h: Int, pix: Array[Byte], q: Float): Array[Byte] = {
      val img =
        new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, pix)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(q)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }
    // w = 45 makes the dHash sample grid land EXACTLY on 5-px stripe
    // boundaries (x(c) = c·45÷9 = 5c), so every sampled comparison is a
    // decisive ±160 step — requantization ringing (±~40) cannot flip
    // any bit, while equal-valued neighbors would flip on codec noise
    val w = 45; val h = 32
    val pix = Array.tabulate(w * h)(k => (if (((k % w) / 5) % 2 == 0) 40 else 200).toByte)
    val hi = jpegAt(w, h, pix, 0.95f)
    val lo = jpegAt(w, h, pix, 0.3f)
    val (_, _, rHi) = Multimodal.Dec.jpeg(hi)
    val (_, _, rLo) = Multimodal.Dec.jpeg(lo)
    assert(!java.util.Arrays.equals(rHi, rLo),
      "fixture degenerate: quality change did not change decoded bytes")
    import spark.implicits._
    val got = Multimodal.nearDupOf(spark.createDataset(Seq(
      Multimodal.MediaIn(1L, "jpeg", hi),
      Multimodal.MediaIn(2L, "jpeg", lo),
      // negative control: unrelated media must not ride along
      Multimodal.MediaIn(3L, "wav", Multimodal.Enc.wav(Multimodal.Content.audioSamples(7L))))))
      .collect()
    val pair = got.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(pair.isDefined, s"cross-quality jpeg pair not detected: ${got.mkString(", ")}")
    assert(pair.get.getInt(2) <= 3, s"hamming ${pair.get.getInt(2)} above the near-dup bar")
    assert(pair.get.getLong(3) == 0L,
      "the pair must be PERCEPTUAL (exact hashes differ) — that is the operator's reason to exist")
    assert(!got.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L),
      "unrelated wav asset paired spuriously")
  }

  test("jpeg media: lossy decode is deterministic and near-faithful, quarantine + store pruning hold") {
    import graft.operators.Multimodal
    import org.apache.spark.sql.functions.col
    val w = 32; val h = 24
    val src = Multimodal.Content.imagePixels(11L, w, h)
    val payload = Multimodal.Enc.jpeg(w, h, src)
    // the container is a real JFIF stream the SOF walk + ImageIO both read
    val (dw, dh, raster) = Multimodal.Dec.jpeg(payload)
    assert((dw, dh) == ((w, h)), s"jpeg geometry drifted: $dw x $dh")
    // LOSSY, deliberately: the decoded raster is NOT the source pixels —
    // asserting inequality pins that this is a genuine DCT codec, not a
    // disguised lossless path the oracle could have replayed
    assert(!java.util.Arrays.equals(raster, src), "jpeg decode was lossless?!")
    // ...but near-faithful (gray 8x8 DCT at ImageIO's default quality)
    val maxErr = raster.zip(src).map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 48, s"jpeg decode error $maxErr exceeds the fixture envelope")
    // fixture-pinned determinism: the content hash of a STORED file is
    // stable across decodes — the property media dedup needs from a
    // lossy format (same bytes => same raster => same hash)
    val batch = Seq(
      Multimodal.MediaIn(1L, "jpeg", payload),
      Multimodal.MediaIn(2L, "jpg", payload), // extension alias, same codec
      Multimodal.MediaIn(90L, "jpeg", payload.take(24)), // truncated: quarantined
      Multimodal.MediaIn(91L, "jpeg", Multimodal.Enc.pgm(4, 4, Array.fill[Byte](16)(42))))
    val feats = Multimodal.MediaDecoder.decodeBatch(batch)
    assert(feats.map(_.doc_id).sorted == Seq(1L, 2L),
      s"corrupt jpeg must quarantine, valid must survive: ${feats.map(_.doc_id)}")
    assert(feats.map(_.content_hash).distinct.size == 1,
      "identical jpeg payloads must hash identically (dedup grain)")
    assert(feats.forall(f => f.width == w && f.height == h && f.n_content_bytes == w.toLong * h))
    // the mm_features operator body accepts the lossy kind end-to-end
    import spark.implicits._
    val viaOperator = Multimodal
      .featuresOf(spark.createDataset(Seq(
        Multimodal.MediaIn(7L, "jpeg", payload),
        Multimodal.MediaIn(8L, "jpeg", Array[Byte](1, 2, 3)))))
      .collect()
    assert(viaOperator.map(_.getLong(0)).toSeq == Seq(7L),
      s"featuresOf jpeg path drifted: ${viaOperator.toSeq}")
    // and the media store partition-prunes the new format like the others
    val dir = java.nio.file.Files.createTempDirectory("graft_jpeg_store").toString
    try {
      graft.Sinks.fullParquet(
        spark.createDataset(Seq(
          Multimodal.MediaIn(1L, "jpeg", payload),
          Multimodal.MediaIn(2L, "wav", Multimodal.Enc.wav(Multimodal.Content.audioSamples(7L)))))
          .toDF(),
        s"$dir/media.parquet",
        Seq("format"))
      val plan = spark.read.parquet(s"$dir/media.parquet")
        .filter(col("format") === "jpeg").queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(format"),
        s"jpeg not partition-pruned:\n$plan")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
