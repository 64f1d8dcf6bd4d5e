package graft

import graft.operators.Windows
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends GraftSpecBase {

  /** The events table through the PRODUCTION loader (nanos handling lives
    * in exactly one place: [[graft.sources.Tables.events]]). */
  private def rawEvents() = graft.sources.Tables.events(spark, sfDir)

  private def loadEvents() = {
    import spark.implicits._
    rawEvents()
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp"), col("value"))
      .as[Ev]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
  }

  /** Typed 5-column event rows for MemoryStream feeding. */
  private def eventRows(): Seq[(Long, Long, Timestamp, String, Double)] =
    rawEvents()
      .select("event_id", "user_id", "ts", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3), r.getDouble(4)))
      .toSeq

  test("streaming hourly agg equals batch hourly agg on bounded input") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val typedInput = MemoryStream[(Long, Long, Timestamp, String, Double)]
    typedInput.addData(eventRows())
    val streamDf = typedInput.toDF().toDF("event_id", "user_id", "ts", "event_type", "value")
    val q = EventStreams.hourly(streamDf)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hourly_out")
      .select("hour_us", "event_type", "num_events", "total_value")
      .collect().map(_.toSeq).toSet
    val batch = Windows.hourly(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("streaming skew monitor census equals the batch keyProbe after two-chunk replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows()
    val input = MemoryStream[(Long, Long, Timestamp, String, Double)]
    // two chunks: the complete-mode count state must carry across triggers
    val (a, b) = rows.splitAt(rows.length / 2)
    input.addData(a)
    val streamDf = input.toDF().toDF("event_id", "user_id", "ts", "event_type", "value")
    val q = EventStreams.keyCounts(streamDf)
      .writeStream.format("memory").queryName("skew_counts")
      .outputMode("complete").start()
    q.processAllAvailable()
    input.addData(b)
    q.processAllAvailable()
    q.stop()
    // the sink-side census over the final counts table — the SAME code
    // path batch uses (Analytics.keyCensus), applied per trigger in prod
    val streamed = graft.operators.Analytics
      .keyCensus(spark.table("skew_counts"), "events.user_id")
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.Analytics
      .keyProbe(rawEvents(), "user_id", "events.user_id")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch, "streamed census must be row-identical to the batch probe")
  }

  test("streaming RFM census + sink scoring equals batch rfm after two-chunk replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // o_orderdate rides as its string rendering (the table is NTZ, which
    // collects as LocalDateTime); rfmBase's cast(o_orderdate AS date)
    // accepts both, so the census code path is identical either way
    val rows = graft.sources.Tables.orders(spark, sfDir)
      .select(
        col("o_custkey"),
        col("o_orderdate").cast("string"),
        col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq
    val input = MemoryStream[(Long, String, Double)]
    // two chunks: the complete-mode (max, count, sum) state must carry
    // across triggers for the census to equal one batch pass
    val (a, b) = rows.splitAt(rows.length / 2)
    input.addData(a)
    val streamDf = input.toDF().toDF("o_custkey", "o_orderdate", "o_totalprice")
    val q = EventStreams.rfmCensus(streamDf)
      .writeStream.format("memory").queryName("rfm_census")
      .outputMode("complete").start()
    q.processAllAvailable()
    input.addData(b)
    q.processAllAvailable()
    q.stop()
    // sink-side scoring over the final census — the SAME code path batch
    // uses (Windows.rfmScores), applied per trigger in prod
    val streamed = graft.operators.Windows
      .rfmScores(spark.table("rfm_census"))
      .collect().map(_.toSeq).toSet
    val batch = Windows.rfm(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, "streamed RFM must be row-identical to batch rfm")
  }

  test("streaming cohort census + sink scoring equals batch cohortLtv after two-chunk replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.sources.Tables.orders(spark, sfDir)
      .select(
        col("o_custkey"),
        col("o_orderdate").cast("string"),
        col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq
    val input = MemoryStream[(Long, String, Double)]
    // two chunks: the complete-mode per-(cust, month) sums must carry
    // across triggers for the census to equal one batch pass
    val (a, b) = rows.splitAt(rows.length / 2)
    input.addData(a)
    val streamDf = input.toDF().toDF("o_custkey", "o_orderdate", "o_totalprice")
    val q = EventStreams.cohortCensus(streamDf)
      .writeStream.format("memory").queryName("cohort_census")
      .outputMode("complete").start()
    q.processAllAvailable()
    input.addData(b)
    q.processAllAvailable()
    q.stop()
    val streamed = graft.operators.Windows
      .cohortLtvScores(spark.table("cohort_census"))
      .collect().map(_.toSeq).toSet
    val batch = Windows.cohortLtv(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, "streamed cohort LTV must be row-identical to batch")
  }

  test("streaming exact dedup keeps one row per distinct content") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2026-01-01 00:00:00")
    def at(mins: Int) = new Timestamp(base.getTime + mins * 60000L)
    val input = MemoryStream[(Long, Timestamp, String)]
    input.addData(Seq(
      (1L, at(0), "alpha beta gamma"),
      (2L, at(1), "delta epsilon"),
      (3L, at(2), "alpha beta gamma"), // dup of 1 within watermark
      (4L, at(3), "zeta eta"),
      (5L, at(4), "delta epsilon"))) // dup of 2 within watermark
    val streamDf = input.toDF().toDF("doc_id", "ts", "text")
    val q = EventStreams.dedupExact(streamDf)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 4L))
  }

  test("streaming dedup state survives a checkpoint restart (no re-admitted dups)") {
    import spark.implicits._
    // file source + explicit checkpoint: the restart path MemoryStream
    // can't exercise — a production dedup stream must keep suppressing
    // content it saw BEFORE the restart, from recovered state alone
    val root = java.nio.file.Files.createTempDirectory("graft_restart").toString
    val srcDir = s"$root/src"
    val base = Timestamp.valueOf("2026-01-01 00:00:00")
    def at(mins: Int) = new Timestamp(base.getTime + mins * 60000L)
    def writeChunk(rows: Seq[(Long, Timestamp, String)]): Unit =
      rows.toDF("doc_id", "ts", "text").coalesce(1)
        .write.mode("append").parquet(srcDir)
    writeChunk(Seq(
      (1L, at(0), "alpha beta gamma"),
      (2L, at(1), "delta epsilon"),
      (3L, at(2), "alpha beta gamma"))) // dup of 1, same incarnation
    val schema = spark.read.parquet(srcDir).schema
    def start() = EventStreams
      .dedupExact(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(srcDir))
      .writeStream.format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/chk")
      .outputMode("append").start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // second incarnation: a NEW query from the same checkpoint; doc 4
    // repeats doc 1's content and must be suppressed by RECOVERED state
    writeChunk(Seq(
      (4L, at(3), "alpha beta gamma"),
      (5L, at(4), "zeta eta")))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val kept = spark.read.parquet(s"$root/out").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 5L),
      s"restart lost or re-admitted state: kept=$kept (want 1, 2, 5)")
  }

  test("bloom admission state survives a checkpoint restart (no re-admitted dups)") {
    import spark.implicits._
    // the twin's only STATE is the intra-stream dedup store; the bloom
    // bits are a plan literal and the corpus hash frame is static — a
    // restart must recover the dedup store and keep the literal gate
    val root = java.nio.file.Files.createTempDirectory("graft_bloom_restart").toString
    val dir = s"$root/data"
    val store = s"$root/bloom"
    val srcDir = s"$root/src"
    Seq((10L, "established corpus page", Some("srcA")))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    graft.operators.BloomStore.build(spark, dir, store, "src19")
    val bytes = graft.operators.BloomStore.readFilterBytes(spark, store)
    val corpusH = graft.sources.Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(md5(col("text")).as("h")).distinct()
    val base = Timestamp.valueOf("2026-01-01 00:00:00")
    def at(mins: Int) = new Timestamp(base.getTime + mins * 60000L)
    def writeChunk(rows: Seq[(Long, String, Timestamp)]): Unit =
      rows.toDF("doc_id", "text", "ts")
        .withColumn("source", lit("src19"))
        .withColumn("lang", lit("en"))
        .withColumn("n_chars", length(col("text")))
        .coalesce(1).write.mode("append").parquet(srcDir)
    writeChunk(Seq(
      (50L, "established corpus page", at(0)), // corpus dup -> dropped (bloom + verify)
      (51L, "fresh batch page", at(1)),
      (52L, "fresh batch page", at(2)))) // intra-stream dup of 51 -> dropped
    val schema = spark.read.parquet(srcDir).schema
    def start() = EventStreams
      .admitBloom(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(srcDir),
        bytes,
        corpusH)
      .writeStream.format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/chk")
      .outputMode("append").start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // restart: 53 repeats 51's content and must be suppressed from
    // RECOVERED dedup state; 54 repeats the corpus and must still hit
    // the literal bloom gate + verify in the new incarnation
    writeChunk(Seq(
      (53L, "fresh batch page", at(3)),
      (54L, "established corpus page", at(4)),
      (55L, "post restart unique", at(5))))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val kept = spark.read.parquet(s"$root/out").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(51L, 55L),
      s"restart lost or re-admitted state: kept=$kept (want 51, 55)")
  }

  test("streaming heavy hitters equals batch top-20 after full replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    // two batches: the complete-mode state must carry counts across triggers
    val (a, b) = docs.splitAt(docs.length / 2)
    input.addData(a)
    val streamDf = input.toDF().toDF("doc_id", "text")
    val q = EventStreams.heavyHitters(streamDf)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    input.addData(b)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hh_out").collect().map(_.toSeq).toSeq
    val batch = graft.operators.TextAnalysis.heavyHitters(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch, "final complete-mode table must be row-identical to batch")
  }

  test("foreachBatch parquet sink persists the streamed aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val input = MemoryStream[(Long, Long, Timestamp, String, Double)]
    input.addData(eventRows())
    val streamDf = input.toDF().toDF("event_id", "user_id", "ts", "event_type", "value")
    val q = EventStreams.hourly(streamDf)
      .writeStream
      .outputMode("complete")
      .foreachBatch((batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Sinks.fullParquet(batch, s"$dir/hourly"))
      .start()
    q.processAllAvailable()
    q.stop()
    val persisted = spark.read.parquet(s"$dir/hourly")
      .select("hour_us", "event_type", "num_events", "total_value")
      .collect().map(_.toSeq).toSet
    val batchRes = Windows.hourly(spark, sfDir).collect().map(_.toSeq).toSet
    assert(persisted == batchRes)
  }

  test("stream-stream interval join matches the batch banded range join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows().map { case (id, uid, ts, _, _) => (id, uid, ts) }
    val inL = MemoryStream[(Long, Long, Timestamp)]
    val inR = MemoryStream[(Long, Long, Timestamp)]
    inL.addData(rows); inR.addData(rows)
    val q = EventStreams.rangeJoin(
        inL.toDF().toDF("event_id", "user_id", "ts"),
        inR.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.format("memory").queryName("rj_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamedPairs = spark.table("rj_out").count()
    val batchPairs = Windows.rangeJoin(spark, sfDir)
      .agg(sum("n_pairs")).collect()(0).getLong(0)
    assert(streamedPairs == batchPairs)
  }

  test("streaming admission equals batch dedup_incremental on a replayed fixture") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_stream_admit").toString
    val dir = s"$base/data"
    val idx = s"$base/idx"
    def run(p: String, from: Int = 0) = (from to from + 10).map(i => s"$p$i").mkString(" ")
    val corpus = Seq(
      (10L, run("beta"), Some("srcA")),
      (40L, run("eta"), None)) // NULL source = corpus: must be indexed too
    // fixture constraint for exact parity (see admitIncremental scaladoc):
    // no intra-batch NEAR-dup pair that isn't also a vs-corpus drop
    val delta = Seq(
      (50L, run("beta"), Some("src19")), // exact dup of corpus 10 -> dropped
      (51L, run("beta"), Some("src19")), // exact dup of 50 (and corpus) -> dropped
      (52L, run("beta", 2), Some("src19")), // near-dup of corpus 10 -> dropped
      (53L, run("uniq"), Some("src19")), // kept
      (54L, run("eta", 2), Some("src19")), // near-dup of NULL-source 40 -> dropped
      (55L, run("solo"), Some("src19")), // kept
      (56L, "tiny doc", Some("src19"))) // < 3 words: no shingles, kept
    (corpus ++ delta)
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      graft.operators.Dedup.clearSharedCache()
      val batch = graft.operators.CorpusOps.dedupIncremental(spark, dir)
        .collect().map(_.toSeq).toSet
      assert(batch.map(_.head) == Set(53L, 55L, 56L), s"unexpected batch baseline: $batch")
      // index of the established corpus (src19 excluded by build)
      graft.operators.GramIndex.build(spark, dir, idx)
      val baseTs = Timestamp.valueOf("2026-01-01 00:00:00")
      val input = MemoryStream[(Long, String, String, String, Long, Timestamp)]
      // replay the batch in doc_id order (the batch keeper rule)
      input.addData(delta.zipWithIndex.map { case ((id, text, src), i) =>
        (id, text, src.get, "en", text.length.toLong, new Timestamp(baseTs.getTime + i * 60000L))
      })
      val streamDf = input.toDF().toDF("doc_id", "text", "source", "lang", "n_chars", "ts")
      val q = EventStreams.admitIncremental(
          streamDf,
          graft.operators.GramIndex.hashes(spark, idx),
          graft.operators.GramIndex.grams(spark, idx))
        .writeStream.format("memory").queryName("admit_out")
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("admit_out")
        .select("doc_id", "lang", "source", "n_chars")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch, s"streaming admission diverged:\nstream=$streamed\nbatch=$batch")
    } finally graft.operators.Dedup.clearSharedCache()
  }

  test("streaming bloom admission equals batch dedup_incremental_bloom after two-chunk replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_stream_bloom").toString
    val dir = s"$base/data"
    val store = s"$base/bloom"
    val corpus = Seq(
      (10L, Some("established page one"), Some("srcA")),
      (11L, Some("corpus only page"), Some("srcA")),
      (40L, Some("null source established page"), None))
    val delta = Seq(
      (50L, Some("established page one"), Some("src19")), // dup of corpus 10 -> dropped
      (51L, Some("null source established page"), Some("src19")), // dup of NULL-source 40 -> dropped
      (52L, Some("fresh delta page alpha"), Some("src19")), // kept (earliest of pair)
      (53L, Some("fresh delta page alpha"), Some("src19")), // intra-stream dup -> dropped
      (54L, Some("unique delta page"), Some("src19")), // kept
      (55L, None: Option[String], Some("src19")), // NULL text: kept
      (56L, None: Option[String], Some("src19"))) // second NULL text: kept too (batch rule)
    (corpus ++ delta)
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", coalesce(length(col("text")), lit(0)))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batch = graft.operators.CorpusOps
      .dedupIncrementalBloom(spark, dir, "src19", store)
      .collect().map(_.toSeq).toSet
    assert(batch.map(_.head) == Set(52L, 54L, 55L, 56L), s"unexpected batch baseline: $batch")
    val bytes = graft.operators.BloomStore.readFilterBytes(spark, store)
    val corpusH = graft.sources.Tables.documents(spark, dir)
      .filter(!(col("source") <=> lit("src19")))
      .filter(col("text").isNotNull)
      .select(md5(col("text")).as("h"))
      .distinct()
    val baseTs = Timestamp.valueOf("2026-01-01 00:00:00")
    val input = MemoryStream[(Long, String, String, String, Long, Timestamp)]
    val rows = delta.zipWithIndex.map { case ((id, text, src), i) =>
      (id, text.orNull, src.get, "en", text.map(_.length.toLong).getOrElse(0L),
        new Timestamp(baseTs.getTime + i * 60000L))
    }
    val (chunk1, chunk2) = rows.splitAt(3)
    val streamDf = input.toDF().toDF("doc_id", "text", "source", "lang", "n_chars", "ts")
    val q = EventStreams.admitBloom(streamDf, bytes, corpusH)
      .writeStream.format("memory").queryName("bloom_admit_out")
      .outputMode("append").start()
    input.addData(chunk1)
    q.processAllAvailable()
    input.addData(chunk2)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("bloom_admit_out")
      .select("doc_id", "lang", "source", "n_chars")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, s"bloom admission diverged:\nstream=$streamed\nbatch=$batch")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("streaming media admission equals batch mm_dedup keepers after two-chunk replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_stream_media").toString
    val dir = s"$base/data"
    // media content is a pure function of (doc_id % 3, n_chars): corpus =
    // docs 0..7; delta docs planted so 30 duplicates corpus doc 3's raster
    // (same kind, same length), 31/34 duplicate each other, 32/33/35 fresh
    val corpus = (0L to 7L).map(d => (d, "x" * (50 + 3 * d).toInt))
    val delta = Seq(
      (30L, "y" * 59), // kind 0, len 59 = corpus doc 3 → bloom-dropped
      (31L, "z" * 77), // kind 1 — kept (first of the 31/34 pair)
      (32L, "w" * 88), // kind 2 — kept
      (33L, "v" * 64), // kind 0 — kept
      (34L, "u" * 77), // kind 1, dup of 31 → intra-stream dropped
      (35L, "t" * 99)) // kind 2 — kept
    (corpus ++ delta)
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // batch baseline: mm_dedup keepers — parity target is its keeper set
    // restricted to the arriving batch (a keeper that is a CORPUS doc
    // means the delta copy must not be admitted)
    val batchKeepers = graft.operators.Multimodal
      .mediaDedup(spark, dir)
      .collect()
      .map(_.getLong(1))
      .toSet
    val expected = batchKeepers.filter(_ >= 30L)
    assert(expected == Set(31L, 32L, 33L, 35L), s"fixture drifted: $expected")
    // frozen corpus gate: bloom bits + exact hash frame over corpus media
    val corpusHashes = graft.operators.Multimodal
      .features(spark, dir)
      .filter(col("doc_id") < 8L)
      .select(col("content_hash").as("h"))
      .distinct()
    val bf = corpusHashes
      .select(xxhash64(col("h")).as("k"))
      .stat.bloomFilter("k", 64L, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bytes = bos.toByteArray
    // stream the delta's REAL container payloads (through the production
    // synthesizer) in doc_id order, two chunks, plus one corrupt asset
    // that must quarantine (drop) without killing the query
    val payloads = graft.operators.Multimodal
      .mediaTable(spark, dir)
      .collect()
      .map(m => m.doc_id -> m)
      .toMap
    val baseTs = Timestamp.valueOf("2026-01-01 00:00:00")
    val rows = delta.map(_._1).sorted.zipWithIndex.map { case (id, i) =>
      val m = payloads(id)
      (m.doc_id, m.format, m.payload, new Timestamp(baseTs.getTime + i * 60000L))
    }
    val corrupt =
      (99L, "png", Array[Byte](1, 2, 3, 4), new Timestamp(baseTs.getTime + 999000L))
    val input = MemoryStream[(Long, String, Array[Byte], Timestamp)]
    val streamDf = input.toDF().toDF("doc_id", "format", "payload", "ts")
    val q = EventStreams.admitMedia(streamDf, bytes, corpusHashes)
      .writeStream.format("memory").queryName("media_admit_out")
      .outputMode("append").start()
    val (chunk1, chunk2) = rows.splitAt(3)
    input.addData(chunk1)
    q.processAllAvailable()
    input.addData(chunk2 :+ corrupt)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("media_admit_out").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamed == expected,
      s"media admission diverged: stream=$streamed batch-keepers=$expected")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("streaming media admission: redelivered doc_id with different payloads keeps both rasters") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Multimodal
    // one doc_id, two DIFFERENT payloads, forced into ONE decode batch
    // (repartition(1)) — the attribution must be per asset, not per
    // doc_id: each row carries its own payload's content hash
    val pA = Multimodal.Enc.pgm(4, 4, Array.tabulate[Byte](16)(i => (40 + i).toByte))
    val pB = Multimodal.Enc.pgm(4, 4, Array.tabulate[Byte](16)(i => (90 - i).toByte))
    val expectedHashes = Multimodal.MediaDecoder
      .decodeBatch(Seq(Multimodal.MediaIn(0L, "pgm", pA), Multimodal.MediaIn(1L, "pgm", pB)))
      .map(_.content_hash).toSet
    assert(expectedHashes.size == 2, "fixture premise: distinct payloads hash apart")
    val corpusHashes = Seq("unrelated").toDF("h")
    val bf = corpusHashes.select(xxhash64(col("h")).as("k")).stat.bloomFilter("k", 4L, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val baseTs = Timestamp.valueOf("2026-01-01 00:00:00")
    val input = MemoryStream[(Long, String, Array[Byte], Timestamp)]
    input.addData(Seq(
      (42L, "pgm", pA, baseTs),
      (42L, "pgm", pB, new Timestamp(baseTs.getTime + 60000L))))
    val streamDf = input.toDF().toDF("doc_id", "format", "payload", "ts").repartition(1)
    val q = EventStreams.admitMedia(streamDf, bos.toByteArray, corpusHashes)
      .writeStream.format("memory").queryName("media_dup_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("media_dup_out")
      .select("doc_id", "content_hash").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.length == 2 && out.forall(_._1 == 42L),
      s"both redelivered assets must admit: ${out.toSeq}")
    assert(out.map(_._2).toSet == expectedHashes,
      s"each asset must carry its OWN payload's hash: ${out.toSeq} vs $expectedHashes")
  }

  test("streaming sessionize equals batch sessionize on bounded ordered input") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    input.addData(loadEvents().toSeq)
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_out")
      .select("event_id", "user_id", "ts_us", "session_id")
      .collect().map(_.toSeq).toSet
    val batch = Windows.sessionize(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("sessionize custom state survives a checkpoint restart (sessions don't reset)") {
    import spark.implicits._
    // flatMapGroupsWithState recovery is a distinct state-store codepath
    // from dropDuplicates — a restarted sessionizer must continue the
    // session numbering AND the last-seen timestamp from recovered state:
    // a post-restart event within the gap must NOT open a new session,
    // and one beyond the gap must increment, not restart at 0
    val root = java.nio.file.Files.createTempDirectory("graft_sess_restart").toString
    val srcDir = s"$root/src"
    val base = Timestamp.valueOf("2026-02-01 00:00:00")
    def at(mins: Int) = new Timestamp(base.getTime + mins * 60000L)
    def writeChunk(rows: Seq[Ev]): Unit =
      rows.toDS().coalesce(1).write.mode("append").parquet(srcDir)
    writeChunk(Seq(Ev(1L, 7L, at(0), 1.0), Ev(2L, 7L, at(5), 1.0)))
    val schema = implicitly[org.apache.spark.sql.Encoder[Ev]].schema
    def start() = EventStreams
      .sessionize(spark.readStream.schema(schema).parquet(srcDir).as[Ev])
      .writeStream.format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/chk")
      .outputMode("append").start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // within-gap (+10 min) and beyond-gap (+50 min) arrivals, second life
    writeChunk(Seq(Ev(3L, 7L, at(15), 1.0), Ev(4L, 7L, at(65), 1.0)))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val sess = spark.read.parquet(s"$root/out")
      .select("event_id", "session_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sess == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L),
      s"recovered sessionizer mis-numbered: $sess")
  }

  test("streaming anomaly flags equal batch win_anomaly on ordered replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    input.addData(loadEvents().toSeq)
    val q = EventStreams.anomalies(input.toDS())
      .writeStream.format("memory").queryName("anom_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("anom_out")
      .select("event_id", "user_id", "ts_us", "value", "z")
      .collect().map(_.toSeq).toSet
    val batch = Windows.anomaly(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"), col("z"))
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty, "fixture has no anomalies — parity test is vacuous")
    assert(streamed == batch,
      s"streaming anomaly diverged: missing=${batch -- streamed} extra=${streamed -- batch}")
  }

  test("streaming streaks equal batch win_streak after ordered two-chunk replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = loadEvents().toSeq
    val input = MemoryStream[Ev]
    // two triggers: the cross-trigger state carry is what's under test
    val (a, b) = evs.splitAt(evs.length / 2)
    input.addData(a)
    val q = EventStreams.streaks(input.toDS())
      .writeStream.format("memory").queryName("streak_out")
      .outputMode("append").start()
    q.processAllAvailable()
    input.addData(b)
    q.processAllAvailable()
    q.stop()
    // each user's LAST emission is its final streak state
    val last = spark.table("streak_out").collect().zipWithIndex
      .groupBy(_._1.getAs[Long]("user_id"))
      .map { case (u, rows) =>
        val r = rows.maxBy(_._2)._1
        u -> ((r.getAs[Long]("best_streak"), r.getAs[Long]("start_day")))
      }
    val batch = Windows.streaks(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("best_streak"), r.getAs[Long]("start_day")))).toMap
    assert(last == batch,
      s"streaming streaks diverged for ${last.keySet.filter(u => last.get(u) != batch.get(u))}")
  }

  test("streaming features equal batch ts_features after ordered two-chunk replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def micros(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    // micro-exact global order so the cross-trigger split respects the
    // twins' ordered-arrival contract even for same-millisecond events
    val evs = loadEvents().sortBy(e => (micros(e.ts), e.event_id)).toSeq
    val input = MemoryStream[Ev]
    val (a, b) = evs.splitAt(evs.length / 2)
    input.addData(a)
    val q = EventStreams.features(input.toDS())
      .writeStream.format("memory").queryName("feat_out")
      .outputMode("append").start()
    q.processAllAvailable()
    input.addData(b)
    q.processAllAvailable()
    q.stop()
    // each (user, day)'s LAST emission is its final feature row
    val last = spark.table("feat_out").collect().zipWithIndex
      .groupBy(r => (r._1.getAs[Long]("user_id"), r._1.getAs[Long]("dayno")))
      .map { case (k, rows) =>
        val r = rows.maxBy(_._2)._1
        k -> ((r.getAs[Double]("revenue"), r.getAs[Double]("revenue_prev_day"),
          r.getAs[Double]("revenue_7d")))
      }
    val batch = Windows.features(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("dayno")) ->
        ((r.getAs[Double]("revenue"), r.getAs[Double]("revenue_prev_day"),
          r.getAs[Double]("revenue_7d"))))
      .toMap
    assert(last == batch,
      s"streaming features diverged for ${last.keySet.filter(k => last.get(k) != batch.get(k)).take(5)}" +
        s" missing=${(batch.keySet -- last.keySet).take(5)} extra=${(last.keySet -- batch.keySet).take(5)}")
  }

  test("streaming tier classification folds to exactly the batch interval-dim rollup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val rows = eventRows()
    val (a, b) = rows.splitAt(rows.length / 2)
    input.addData(a)
    val q = EventStreams
      .classifyTiers(
        input.toDF().toDF("event_id", "user_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("tiers_out")
      .outputMode("append").start()
    q.processAllAvailable()
    input.addData(b)
    q.processAllAvailable()
    q.stop()
    // the batch operator IS the stream's downstream rollup — aggregating
    // the streamed labels must reproduce it cell-exactly
    val streamed = spark.table("tiers_out")
      .groupBy("tier_ord", "tier")
      .agg(count(lit(1)).as("n_events"), (sum(col("c")) / 100.0).as("total_value"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    val batch = Windows.intervalDim(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq,
      s"streamed tier rollup diverged:\n stream=${streamed.toSeq}\n batch=${batch.toSeq}")
  }

  test("streaming EMA is row-identical to batch win_ema after ordered two-chunk replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = loadEvents().toSeq
    val input = MemoryStream[Ev]
    val (a, b) = evs.splitAt(evs.length / 2)
    input.addData(a)
    val q = EventStreams.ema(input.toDS())
      .writeStream.format("memory").queryName("ema_out")
      .outputMode("append").start()
    q.processAllAvailable()
    input.addData(b)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ema_out").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(0), r.getDouble(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2, t._3))
    val batch = Windows.ema(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2, t._3))
    assert(streamed.length == batch.length,
      s"row count diverged: stream=${streamed.length} batch=${batch.length}")
    for ((s0, b0) <- streamed.zip(batch))
      assert(s0 == b0, s"streamed EMA diverged: $s0 vs $b0")
  }

  test("streaming TWAP equals batch ts_twap after ordered two-chunk replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def micros(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val evs = eventRows()
      .map(r => EventStreams.Ev(r._1, r._2, r._3, r._5))
      .sortBy(e => (micros(e.ts), e.event_id))
    val input = MemoryStream[EventStreams.Ev]
    val (a, b) = evs.splitAt(evs.length / 2)
    input.addData(a)
    val q = EventStreams.twap(input.toDS())
      .writeStream.format("memory").queryName("twap_out")
      .outputMode("append").start()
    q.processAllAvailable()
    input.addData(b)
    q.processAllAvailable()
    q.stop()
    // last emission per user == the batch row (update-style convention)
    val streamed = spark.table("twap_out").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .zipWithIndex
      .groupBy(_._1._1).map { case (u, xs) => (u, xs.maxBy(_._2)._1._2) }
      .toSeq.sortBy(_._1)
    val batch = graft.operators.Windows.twap(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toSeq.sortBy(_._1)
    assert(streamed.length == batch.length,
      s"user count diverged: stream=${streamed.length} batch=${batch.length}")
    for ((s0, b0) <- streamed.zip(batch))
      assert(s0 == b0, s"streamed TWAP diverged: $s0 vs $b0")
  }

  test("streaming asof enrichment equals batch asof_join after ordered two-chunk replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the merged tagged feed: deduped orders (the batch groupBy) +
    // events, in global (t_us, order-before-event, id) arrival order
    val orderRows = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy(col("o_custkey").as("user_id"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("t_us"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .collect()
      .map(r => EventStreams.AsofIn(r.getLong(0), r.getLong(1), None, Some(r.getLong(2))))
    val eventFeed = rawEvents()
      .select(col("user_id"), expr("unix_micros(ts)").as("t_us"), col("event_id"))
      .collect()
      .map(r => EventStreams.AsofIn(r.getLong(0), r.getLong(1), Some(r.getLong(2)), None))
    val feed = (orderRows ++ eventFeed).sortBy(r =>
      (r.t_us, r.o_orderkey.isEmpty, r.event_id.getOrElse(0L)))
    val input = MemoryStream[EventStreams.AsofIn]
    val (a, b) = feed.splitAt(feed.length / 2)
    input.addData(a.toSeq)
    val q = EventStreams.asofEnrich(input.toDS())
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    q.processAllAvailable()
    input.addData(b.toSeq)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("asof_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val batch = graft.operators.Windows.asofJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(streamed.length == batch.length,
      s"row count diverged: stream=${streamed.length} batch=${batch.length}")
    for ((s0, b0) <- streamed.zip(batch))
      assert(s0 == b0, s"streamed asof diverged: $s0 vs $b0")
    assert(streamed.nonEmpty, "fixture vacuous: no event matched an order")
  }

  test("streaming autocorr equals batch ts_autocorr after two-chunk ordered replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = eventRows()
      .map(r => EventStreams.Ev(r._1, r._2, r._3, r._5))
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[EventStreams.Ev]
    val (a, b) = evs.splitAt(evs.length / 2)
    input.addData(a)
    val q = EventStreams.autocorr(input.toDS())
      .writeStream.format("memory").queryName("acf_out")
      .outputMode("append").start()
    q.processAllAvailable()
    input.addData(b)
    q.processAllAvailable()
    q.stop()
    def opt(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    val streamed = spark.table("acf_out").collect()
      .map(r => (r.getLong(0), (r.getLong(1), opt(r, 2), opt(r, 3))))
      .zipWithIndex
      .groupBy(_._1._1).map { case (u, xs) => (u, xs.maxBy(_._2)._1._2) }
      .toSeq.sortBy(_._1)
    val batch = graft.operators.Windows.autocorr(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), opt(r, 2), opt(r, 3))))
      .toSeq.sortBy(_._1)
    assert(streamed.length == batch.length,
      s"user count diverged: stream=${streamed.length} batch=${batch.length}")
    for ((s0, b0) <- streamed.zip(batch))
      assert(s0 == b0, s"streamed acf diverged: $s0 vs $b0")
    assert(batch.exists(b => b._2._2.isDefined && b._2._3.isDefined),
      "fixture yields no defined acf — parity vacuous")
  }

  test("streaming trend equals batch ts_trend after two-chunk replay — sums are order-free") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // deliberately NOT time-sorted: the sufficient-statistic state is a
    // set of commuting sums, so an arbitrarily shuffled replay must
    // converge to the identical fit (a property no ring/lag twin has)
    val evs = eventRows()
      .map(r => EventStreams.Ev(r._1, r._2, r._3, r._5))
      .sortBy(e => (e.event_id % 7, e.event_id))
    val input = MemoryStream[EventStreams.Ev]
    val (a, b) = evs.splitAt(evs.length / 2)
    input.addData(a)
    val q = EventStreams.trend(input.toDS())
      .writeStream.format("memory").queryName("trend_out")
      .outputMode("append").start()
    q.processAllAvailable()
    input.addData(b)
    q.processAllAvailable()
    q.stop()
    def opt(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    val streamed = spark.table("trend_out").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), opt(r, 3), opt(r, 4))))
      .zipWithIndex
      .groupBy(_._1._1).map { case (u, xs) => (u, xs.maxBy(_._2)._1._2) }
      .toSeq.sortBy(_._1)
    val batch = graft.operators.Windows.trend(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), opt(r, 3), opt(r, 4))))
      .toSeq.sortBy(_._1)
    assert(streamed.length == batch.length,
      s"user count diverged: stream=${streamed.length} batch=${batch.length}")
    for ((s0, b0) <- streamed.zip(batch))
      assert(s0 == b0, s"streamed trend diverged: $s0 vs $b0")
  }

  test("streaming conversion latency equals batch win_conversion_time after two-chunk replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def micros(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val evs = eventRows()
      .map(r => EventStreams.PathEv(r._1, r._2, r._3, r._4))
      .sortBy(e => (micros(e.ts), e.event_id))
    val input = MemoryStream[EventStreams.PathEv]
    val (a, b) = evs.splitAt(evs.length / 2)
    input.addData(a)
    val q = EventStreams.conversions(input.toDS())
      .writeStream.format("memory").queryName("conv_out")
      .outputMode("append").start()
    q.processAllAvailable()
    input.addData(b)
    q.processAllAvailable()
    q.stop()
    val obs = spark.table("conv_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(obs.map(_._1).distinct.length == obs.length, "one latency per converting user")
    // downstream band rollup = the batch operator's CASE cuts + exact mean
    def bandOf(l: Long): (Int, String) =
      if (l < 3600L) (1, "lt_1h") else if (l < 86400L) (2, "lt_1d")
      else if (l < 604800L) (3, "lt_7d") else (4, "ge_7d")
    val streamed = obs.groupBy(o => bandOf(o._2)).map { case ((ord, band), xs) =>
      val lats = xs.map(_._2)
      val avg = BigDecimal(lats.sum.toDouble / lats.length)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      (ord, band, lats.length.toLong, avg, lats.min, lats.max)
    }.toSeq.sortBy(_._1)
    val batch = graft.operators.Windows.conversionTime(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(streamed == batch,
      s"streamed conversion bands diverged:\n stream=$streamed\n batch=$batch")
  }

  test("streaming path census equals batch win_paths after ordered two-chunk replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // full 5-column rows → typed PathEv, globally ordered so each chunk
    // preserves per-user order; the split lands mid-stream on purpose —
    // trigrams SPANNING the trigger boundary are the thing under test
    def micros(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val evs = eventRows()
      .map(r => EventStreams.PathEv(r._1, r._2, r._3, r._4))
      .sortBy(e => (micros(e.ts), e.event_id))
    val input = MemoryStream[EventStreams.PathEv]
    val (a, b) = evs.splitAt(evs.length / 2)
    input.addData(a)
    val q = EventStreams.paths(input.toDS())
      .writeStream.format("memory").queryName("paths_out")
      .outputMode("append").start()
    q.processAllAvailable()
    input.addData(b)
    q.processAllAvailable()
    q.stop()
    // downstream census + identical (n DESC, lexicographic) top-10 cut
    val streamed = spark.table("paths_out").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }.toSeq
      .sortBy { case ((x, y, z), n) => (-n, x, y, z) }
      .take(10)
    val batch = Windows.paths(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3))).toSeq
    assert(streamed == batch,
      s"streamed path census diverged:\n stream=$streamed\n batch=$batch")
  }

  test("streaming decontamination equals the batch contamination drop set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.sources.Tables.documents(spark, sfDir)
    // static side: the batch operator's eval gram frame (eval = src0)
    val evalGrams = docs
      .filter(col("source") === "src0")
      .select(
        col("doc_id").as("eval_doc"),
        call_function("graft_grams", col("text")).as("garr"))
      .filter(col("garr").isNotNull)
      .select(col("eval_doc"), size(col("garr")).as("n_eval"), explode(col("garr")).as("gram"))
    // stream side: every training doc (NULL source included — checked as
    // training data, the batch operator's convention)
    val train = docs
      .filter(coalesce(col("source") =!= "src0", lit(true)))
      .select("doc_id", "text", "source", "lang", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)), r.getString(3), r.getLong(4)))
      .toSeq
    val input = MemoryStream[(Long, String, Option[String], String, Long)]
    input.addData(train)
    val q = EventStreams.decontaminate(
        input.toDF().toDF("doc_id", "text", "source", "lang", "n_chars"),
        evalGrams)
      .writeStream.format("memory").queryName("decontam_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("decontam_out").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val dropped = graft.operators.CorpusOps.contamination(spark, sfDir)
      .select("train_doc").collect().map(_.getLong(0)).toSet
    assert(dropped.nonEmpty, "fixture has no contaminated doc — parity test is vacuous")
    val expected = train.map(_._1).toSet -- dropped
    assert(streamed == expected,
      s"decontamination diverged: missing=${expected -- streamed} extra=${streamed -- expected}")
  }

  test("streaming drift monitor equals batch_drift after the batch fully streams in") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.sources.Tables.documents(spark, sfDir)
    // static side: the established corpus census (non-src19; NULL source
    // counts as corpus — the batch operator's convention)
    val corpusCensus = docs
      .filter(!coalesce(col("source") === "src19", lit(false)))
      .groupBy(coalesce(col("lang"), lit("(none)")).as("lang"))
      .agg(count(lit(1)).as("corpus_docs"), sum(col("n_chars")).as("corpus_chars"))
    // stream side: the arriving batch, replayed in two chunks so the
    // monitor genuinely updates across triggers
    val batchRows = docs
      .filter(col("source") === "src19")
      .select("doc_id", "lang", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(batchRows.size >= 2, "fixture needs ≥ 2 src19 docs for a two-chunk replay")
    val input = MemoryStream[(Long, String, Long)]
    val q = EventStreams.driftMonitor(
      input.toDF().toDF("doc_id", "lang", "n_chars"),
      corpusCensus,
      "drift_snapshot")
    try {
      val (first, rest) = batchRows.splitAt((batchRows.size + 1) / 2)
      input.addData(first)
      q.processAllAvailable()
      val mid = spark.table("drift_snapshot").agg(sum("batch_docs")).head().getLong(0)
      assert(mid == first.size, s"mid-stream census wrong: $mid != ${first.size}")
      input.addData(rest)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("drift_snapshot").orderBy("lang").collect().toSeq
    val batch = graft.operators.CorpusOps.batchDrift(spark, sfDir).collect().toSeq
    assert(streamed == batch,
      s"drift diverged:\nstream=$streamed\nbatch =$batch")
  }

  test("streaming ohlc equals batch ts_ohlc on bounded input") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp, String, Double)]
    input.addData(eventRows())
    val q = EventStreams.ohlc(
        input.toDF().toDF("event_id", "user_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("ohlc_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ohlc_out").collect().map(_.toSeq).toSet
    val batch = Windows.ohlc(spark, sfDir).collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"ohlc diverged: missing=${batch -- streamed} extra=${streamed -- batch}")
  }

  test("streaming embedding drift equals batch emb_drift after full replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // freeze the corpus centroid (the static side) at wiring time
    val (gcent, _) = graft.operators.Similarity.globalCentroid(spark, sfDir)
    val batch = graft.operators.Similarity
      .drift(spark, sfDir)
      .collect()
      .map(_.toSeq)
      .toSet
    assert(batch.nonEmpty, "no batch drift rows — parity test is vacuous")
    val rows = spark.read
      .parquet(s"$sfDir/embeddings.parquet")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
      .toSeq
    val input = MemoryStream[(Long, Seq[Float], Int)]
    // two chunks: the per-label (sum, count) state must carry across triggers
    val (a, b) = rows.splitAt(rows.length / 2)
    input.addData(a)
    val q = EventStreams
      .embDrift(input.toDF().toDF("vec_id", "embedding", "label"), gcent)
      .writeStream
      .format("memory")
      .queryName("embdrift_out")
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    input.addData(b)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("embdrift_out").collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"drift diverged: missing=${batch -- streamed} extra=${streamed -- batch}")
  }

  test("streaming ANN serving equals ann_lsh_idx's top-5 after two-chunk replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_srv_ann").toString
    val path = s"$tmp/store"
    try {
      graft.operators.VectorIndex.build(spark, sfDir, path)
      // freeze the store's bodies as the resident serving shard
      val buckets = spark.read.parquet(s"$path/lshbuckets").collect()
        .map(r => (r.getAs[Number]("t").longValue() * 16L + r.getAs[Number]("b").longValue(),
          r.getAs[Long]("vec_id")))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted.toSeq }
      val vecRows = spark.read.parquet(s"$path/vectors").collect()
      val vectors = vecRows.map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Long]]("qv")).toMap
      val norms = vecRows.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("nq")).toMap
      val batch = graft.operators.VectorIndex.annLshIndexed(spark, sfDir, path).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(batch.nonEmpty, "no batch serving rows — parity test is vacuous")
      // the query stream = the RAW rows behind the store's own sample
      // (re-gated in-stream; shared admission code)
      val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .filter(col("vec_id") % 100 === 0)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
        .toSeq
      val input = MemoryStream[(Long, Seq[Float], Int)]
      val (a, b) = rows.splitAt(rows.length / 2)
      input.addData(a)
      val q = EventStreams.serveAnnLsh(
          input.toDF().toDF("vec_id", "embedding", "label"),
          buckets, vectors, norms)
        .writeStream.format("memory").queryName("srv_ann_out")
        .outputMode("append").start()
      q.processAllAvailable()
      input.addData(b)
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("srv_ann_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(streamed == batch,
        s"serving diverged: missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("streaming cluster assignment equals the batch kmeans assignment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // freeze the batch-trained codebook
    val cents = graft.operators.Similarity
      .kmeansCentroids(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1), r.getLong(2)))
      .toSeq
    val batch = graft.operators.Similarity
      .kmeansAssignments(spark, sfDir)
      .select("vec_id", "cid")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .toSet
    assert(batch.nonEmpty, "no batch assignments — parity test is vacuous")
    // replay the embeddings in two chunks (stateless, but the split pins
    // that assignment needs no cross-trigger context)
    val rows = spark.read
      .parquet(s"$sfDir/embeddings.parquet")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
      .toSeq
    val input = MemoryStream[(Long, Seq[Float], Int)]
    val (a, b) = rows.splitAt(rows.length / 2)
    input.addData(a)
    val q = EventStreams.assignClusters(
        input.toDF().toDF("vec_id", "embedding", "label"),
        cents)
      .writeStream.format("memory").queryName("assign_out")
      .outputMode("append").start()
    q.processAllAvailable()
    input.addData(b)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("assign_out").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(streamed == batch,
      s"assignment diverged: missing=${batch -- streamed} extra=${streamed -- batch}")
  }

  test("streaming quality scoring equals batch text_quality_model on two-chunk replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wt = graft.operators.TextAnalysis.qualityTrain(spark, sfDir).collect()
    val weights = wt.filter(_.getLong(0) >= 0L).map(r => r.getLong(0) -> r.getLong(3)).toMap
    val prior = wt.find(_.getLong(0) == -1L).get.getLong(3)
    val batch = graft.operators.TextAnalysis.qualityModel(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(batch.nonEmpty, "no batch scores — parity test is vacuous")
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Long, String)]
    val (a, b) = rows.splitAt(rows.length / 2)
    input.addData(a)
    val q = EventStreams.scoreQuality(
        input.toDF().toDF("doc_id", "text"), weights, prior)
      .writeStream.format("memory").queryName("nbq_out")
      .outputMode("append").start()
    q.processAllAvailable()
    input.addData(b)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("nbq_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(streamed == batch,
      s"quality scores diverged: missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }

  test("streaming unigram tokenization equals batch text_tokens_unigram on two-chunk replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // freeze the batch-fitted vocabulary; ids = utf8 piece order, the
    // batch kernel's id space
    val vocab = graft.operators.TextAnalysis.unigramTrain(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(3)))
      .sortWith((a, b) => graft.operators.TextAnalysis.utf8Compare(a._1, b._1) < 0)
    assert(vocab.nonEmpty, "no fitted vocabulary — parity test is vacuous")
    val batch = graft.operators.TextAnalysis.tokensUnigram(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(batch.nonEmpty, "no batch tokenization — parity test is vacuous")
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Long, String)]
    val (a, b) = rows.splitAt(rows.length / 2)
    input.addData(a)
    val q = EventStreams.tokenizeUnigram(
        input.toDF().toDF("doc_id", "text"), vocab.map(_._1).toSeq, vocab.map(_._2).toSeq)
      .writeStream.format("memory").queryName("uni_out")
      .outputMode("append").start()
    q.processAllAvailable()
    input.addData(b)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("uni_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(streamed == batch,
      s"unigram ids diverged: missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }

  test("streaming dsir scoring equals batch text_dsir on two-chunk replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // freeze the batch-fitted weight table (bucket -> micro-nat LLR)
    val weights = graft.operators.TextAnalysis.dsirWeights(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(weights.nonEmpty, "no dsir weights — parity test is vacuous")
    val batch = graft.operators.TextAnalysis.dsir(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(batch.nonEmpty, "no batch dsir scores — parity test is vacuous")
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Long, String)]
    val (a, b) = rows.splitAt(rows.length / 2)
    input.addData(a)
    val q = EventStreams.scoreDsir(input.toDF().toDF("doc_id", "text"), weights)
      .writeStream.format("memory").queryName("dsir_out")
      .outputMode("append").start()
    q.processAllAvailable()
    input.addData(b)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dsir_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch,
      s"dsir scores diverged: missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }
}
