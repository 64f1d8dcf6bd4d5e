package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media as opaque `BINARY` payloads with
  * typed metadata, and run decode/feature-extraction as *batched*
  * per-partition processing over a typed `Dataset` — the Scala shape of a
  * `mapInPandas` media pipeline.
  *
  * The actual decoder is a STUB (no image/audio libs in this container —
  * [[MediaDecoder.decodeBatch]] is a deterministic fake). What is real and
  * tested: the binary column schema, the case-class `Encoder` round-trip,
  * the partition-batched invocation shape (decoders amortize model/codec
  * init per batch, exactly like a pandas UDF batch), and the feature schema
  * that downstream operators join against.
  *
  * Scale: decode is a narrow map — no shuffle; batch size bounds peak
  * memory per task no matter how large the corpus.
  */
object Multimodal {

  /** Input row: media payload + metadata. */
  case class MediaIn(doc_id: Long, format: String, payload: Array[Byte])

  /** Extracted features (decode output). */
  case class MediaFeat(
      doc_id: Long,
      format: String,
      width: Long,
      height: Long,
      n_bytes: Long,
      feat_hash: String)

  /** STUB decoder — stands in for an image/audio codec. Deterministic:
    * "dimensions" derive from payload size, "feature hash" is the md5 of
    * the bytes. A real deployment swaps only this object; the Spark
    * plumbing around it is unchanged. */
  object MediaDecoder {
    def decodeBatch(batch: Seq[MediaIn]): Seq[MediaFeat] = {
      // per-batch init would happen here (codec/model load) — amortized
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { m =>
        val n = m.payload.length.toLong
        md.reset()
        val hex = md.digest(m.payload).map("%02x".format(_)).mkString
        MediaFeat(m.doc_id, m.format, 64 + n % 512, 64 + (n * 7) % 512, n, hex)
      }
    }
  }

  /** documents → fake binary payload (utf-8 of text) + format metadata →
    * batched stub decode → typed feature rows. */
  def features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media: Dataset[MediaIn] = Tables
      .documents(s, dir)
      // a row with no payload has nothing to decode: DROP it rather than
      // NPE the whole job on one bad crawl row (the oracle filters
      // identically; callers can count the dropped rows as
      // input.count − output.count — no profile operator counts
      // missing-media specifically)
      .filter(col("text").isNotNull)
      .select(
        col("doc_id"),
        element_at(array(lit("png"), lit("jpeg"), lit("wav")), (col("doc_id") % 3 + 1).cast("int"))
          .as("format"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaIn]
    media
      .mapPartitions(it => it.grouped(32).flatMap(MediaDecoder.decodeBatch))
      .toDF()
  }

  // strlen = BYTE length (the payload is utf-8 bytes); md5 of a string
  // hashes its utf-8 bytes in both engines
  val featuresSql: String =
    """SELECT doc_id,
              ['png', 'jpeg', 'wav'][CAST(doc_id % 3 + 1 AS INT)] AS format,
              64 + strlen(text) % 512 AS width,
              64 + (strlen(text) * 7) % 512 AS height,
              CAST(strlen(text) AS BIGINT) AS n_bytes,
              md5(text) AS feat_hash
       FROM documents
       WHERE text IS NOT NULL
       ORDER BY doc_id"""

  /** A synthetic "video" row: opaque binary payload + frame geometry. */
  case class VideoIn(doc_id: Long, payload: Array[Byte])

  /** One sampled frame: source frame index, presentation time, content
    * fingerprint. */
  case class Frame(doc_id: Long, frame_idx: Long, src_frame: Long, ts_ms: Long, frame_hash: String)

  /** STUB frame sampler — stands in for a video codec's keyframe reader.
    * Treats the payload as 64 fixed 32-byte "frames" at 25 fps and samples
    * every 8th; the hash is the md5 of the frame's bytes. Deterministic so
    * the DuckDB oracle can replay it; a real deployment swaps only this
    * object. */
  object FrameSampler {
    val FrameBytes = 32
    val SampleEvery = 8
    val FrameMs = 40L // 25 fps
    def sampleBatch(batch: Seq[VideoIn]): Seq[Frame] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.flatMap { v =>
        val nFrames = v.payload.length / FrameBytes
        (0 until nFrames by SampleEvery).zipWithIndex.map { case (src, idx) =>
          md.reset()
          val hex = md5Hex(md, v.payload, src * FrameBytes, FrameBytes)
          Frame(v.doc_id, idx.toLong, src.toLong, src * FrameMs, hex)
        }
      }
    }
    private def md5Hex(md: java.security.MessageDigest, bytes: Array[Byte], from: Int, len: Int): String = {
      md.update(bytes, from, len)
      md.digest().map("%02x".format(_)).mkString
    }
  }

  /** Frame-sampling plumbing: documents → deterministic fake video payload
    * (2048 bytes = 64 "frames") → per-partition batched sampling → one row
    * per kept frame. Same architecture as [[features]]: the decode is a
    * stub, the binary-column schema, batch shape, and row-explosion
    * semantics (1 video row → N frame rows out of `mapPartitions`, no
    * `explode` needed) are the real, tested part. Narrow map — at 100 TB
    * frame extraction streams at scan speed with per-task memory bounded
    * by batch size. */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val videos: Dataset[VideoIn] = Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        encode(repeat(md5(col("doc_id").cast("string")), 64), "UTF-8").as("payload"))
      .as[VideoIn]
    videos
      .mapPartitions(it => it.grouped(32).flatMap(FrameSampler.sampleBatch))
      .toDF()
  }

  // the fake payload is 64 repeats of a 32-char md5 hex string (ascii: one
  // byte per char), so frame f covers string offset f*32+1, length 32
  val frameSampleSql: String =
    """SELECT doc_id,
              CAST(i AS BIGINT) AS frame_idx,
              CAST(i * 8 AS BIGINT) AS src_frame,
              CAST(i * 8 * 40 AS BIGINT) AS ts_ms,
              md5(substr(repeat(md5(CAST(doc_id AS VARCHAR)), 64), CAST(i * 8 * 32 + 1 AS INT), 32)) AS frame_hash
       FROM documents, UNNEST(range(8)) AS t(i)
       ORDER BY doc_id, frame_idx"""

  /** Resize output: original + target geometry and the resampled payload's
    * fingerprint. */
  case class Resized(
      doc_id: Long,
      orig_w: Long,
      orig_h: Long,
      new_w: Long,
      new_h: Long,
      n_bytes_out: Long,
      resized_hash: String)

  /** STUB resizer — stands in for an image scaler. Geometry derives from
    * payload size exactly like [[MediaDecoder]]; the "resampled" payload is
    * the first ceil(n/2) bytes (deterministic, oracle-replayable). A real
    * deployment swaps only this object. */
  object Resizer {
    def resizeBatch(batch: Seq[MediaIn]): Seq[Resized] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { m =>
        val n = m.payload.length.toLong
        val w = 64 + n % 512
        val h = 64 + (n * 7) % 512
        val outLen = ((n + 1) / 2).toInt
        md.reset()
        md.update(m.payload, 0, outLen)
        val hex = md.digest().map("%02x".format(_)).mkString
        Resized(m.doc_id, w, h, math.max(32L, w / 2), math.max(32L, h / 2), outLen.toLong, hex)
      }
    }
  }

  /** Half-resolution resize pass over the same binary payloads as
    * [[features]] — the third multimodal verb (decode / extract /
    * **resize** / frame-sample), batched per partition like the rest.
    * Narrow map; scan-speed at any corpus size. */
  def resize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media: Dataset[MediaIn] = Tables
      .documents(s, dir)
      // same NULL-payload drop (and rationale) as [[features]]
      .filter(col("text").isNotNull)
      .select(
        col("doc_id"),
        element_at(array(lit("png"), lit("jpeg"), lit("wav")), (col("doc_id") % 3 + 1).cast("int"))
          .as("format"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaIn]
    media
      .mapPartitions(it => it.grouped(32).flatMap(Resizer.resizeBatch))
      .toDF()
  }

  // document text is ASCII (verified against the generated data), so
  // substr-by-chars == slice-by-bytes and md5(substr(text, ...)) replays
  // the byte-level stub exactly
  val resizeSql: String =
    """SELECT doc_id,
              64 + strlen(text) % 512 AS orig_w,
              64 + (strlen(text) * 7) % 512 AS orig_h,
              GREATEST(32, (64 + strlen(text) % 512) // 2) AS new_w,
              GREATEST(32, (64 + (strlen(text) * 7) % 512) // 2) AS new_h,
              CAST((strlen(text) + 1) // 2 AS BIGINT) AS n_bytes_out,
              md5(substr(text, 1, CAST((strlen(text) + 1) // 2 AS INT))) AS resized_hash
       FROM documents
       WHERE text IS NOT NULL
       ORDER BY doc_id"""

  /** Media content dedup — exact payload-hash dedup at the MEDIA grain,
    * the image-pipeline move (identical bytes = identical asset no
    * matter which crawl delivered them): keeper = lowest doc_id per
    * payload hash (the [[Dedup.exactDupPairs]] keeper rule), with the
    * copy count and how many distinct container FORMATS the same bytes
    * arrived under (n_formats > 1 flags mislabeled containers — the
    * metadata differs, the content doesn't). Rides [[features]]' batched
    * decode plumbing, so the hash comes from the same per-partition
    * batches a real codec would produce; the whole operator is a narrow
    * map + ONE map-side-combined groupBy on the hash — scan-speed at
    * 100 TB, no pair expansion (exact hashing needs no candidates). */
  def mediaDedup(s: SparkSession, dir: String): DataFrame =
    features(s, dir)
      .groupBy(col("feat_hash").as("content_hash"))
      .agg(
        min(col("doc_id")).as("keeper_doc_id"),
        count(lit(1)).as("n_copies"),
        countDistinct(col("format")).as("n_formats"))

  val mediaDedupSql: String =
    """SELECT md5(text) AS content_hash,
              MIN(doc_id) AS keeper_doc_id,
              CAST(COUNT(*) AS BIGINT) AS n_copies,
              CAST(COUNT(DISTINCT ['png', 'jpeg', 'wav'][CAST(doc_id % 3 + 1 AS INT)])
                   AS BIGINT) AS n_formats
       FROM documents
       WHERE text IS NOT NULL
       GROUP BY 1
       ORDER BY keeper_doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> (features _),
    "mm_resize" -> (resize _),
    "mm_frame_sample" -> (frameSample _),
    "mm_dedup" -> (mediaDedup _))

  val oracles: Map[String, String] = Map(
    "mm_features" -> featuresSql,
    "mm_resize" -> resizeSql,
    "mm_frame_sample" -> frameSampleSql,
    "mm_dedup" -> mediaDedupSql)
}
