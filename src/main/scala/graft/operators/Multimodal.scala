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
      .select(
        col("doc_id"),
        element_at(array(lit("png"), lit("jpeg"), lit("wav")), (col("doc_id") % 3 + 1).cast("int"))
          .as("format"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaIn]
    media
      .mapPartitions(it => it.grouped(32).flatMap(MediaDecoder.decodeBatch))
      .toDF()
      .orderBy("doc_id")
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
       ORDER BY doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> (features _))

  val oracles: Map[String, String] = Map(
    "mm_features" -> featuresSql)
}
