package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index of the documents table — the third
  * between-crawls store beside [[GramIndex]] (admission) and
  * [[CorpusProfile]] (monitoring): ad-hoc ranked retrieval without ever
  * re-scanning the corpus text.
  *
  * [[TextAnalysis.search]] is the scan-time oracle anchor: correct, but
  * one full corpus scan per query. A pipeline queries its corpus far more
  * often than the corpus changes, so the amortization is the classic
  * one — persist the two facts TF-IDF needs:
  *
  *   - `<path>/postings`: `(tok STRING, doc_id BIGINT, tf BIGINT)` — one
  *     ROW per (token, document) pair, never an array: a stop word's
  *     posting list is corpus-sized, and rows keep it partitioned instead
  *     of materializing an unbounded list in one aggregation buffer (the
  *     hot-key lesson from the dedup pipelines, applied at write time).
  *     Range-partitioned and sorted by (tok, doc_id), so a term-equality
  *     query prunes to its own files/row groups via parquet min/max
  *     stats — the query reads O(matching postings), not O(index).
  *   - `<path>/vocab`: `(tok, df)` — exact document frequencies, one row
  *     per type.
  *   - `<path>/meta`: freshness stamp + exact corpus doc count (the IDF
  *     numerator — counted once at build, a driver literal at query
  *     time) + a FORMAT VERSION so a code change can never serve an old
  *     index false-fresh ([[GramIndex]]'s convention, same meta plumbing).
  *
  * Staleness: the stamp binds the index to the documents table's on-disk
  * state; [[searchIndexed]] rebuilds when stale (first driver call
  * builds, later calls — e.g. bench passes — find it fresh, so the build
  * reads as pass-1 warmup under the bench's `store_backed` flag).
  * Concurrency follows [[GramIndex]]'s contract verbatim: meta is
  * written LAST so a crash mid-build leaves a stale-by-stamp index, but
  * a build racing a concurrent reader of the same path can fail that
  * reader's scan — serialize builds against queries per index path, or
  * stage-and-swap.
  */
object TextIndex {

  /** Bump when tokenization, the postings schema, or the scoring contract
    * changes — a stale-by-code index must never be served false-fresh. */
  private[graft] val FormatVersion = "v1:ws-tok:tfidf"

  /** Build (overwrite) the index at `indexPath` from `dir`'s documents. */
  def build(s: SparkSession, dir: String, indexPath: String): Unit = {
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val posts = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok", "doc_id")
      .agg(count(lit(1)).as("tf"))
    posts
      .repartitionByRange(col("tok"))
      .sortWithinPartitions("tok", "doc_id")
      .write
      .mode("overwrite")
      .parquet(s"$indexPath/postings")
    posts
      .groupBy("tok")
      .agg(count(lit(1)).as("df"))
      .repartitionByRange(col("tok"))
      .write
      .mode("overwrite")
      .parquet(s"$indexPath/vocab")
    GramIndex.writeMeta(
      s, indexPath, Seq(GramIndex.stamp(dir), n.toString, FormatVersion).mkString("\n"))
  }

  private def freshMeta(s: SparkSession, dir: String, indexPath: String): Option[Long] =
    GramIndex.readMeta(s, indexPath).collect {
      case lines
          if lines.length >= 3 && lines(0) == GramIndex.stamp(dir) &&
            lines(2) == FormatVersion =>
        lines(1).toLong
    }

  def isFresh(s: SparkSession, dir: String, indexPath: String): Boolean =
    freshMeta(s, dir, indexPath).isDefined

  /** [[TextAnalysis.search]] served from the persisted index — the
    * identical ranking contract (same terms, same fixed-order integer-tf
    * TF-IDF expression, same top-20 cut, same DuckDB oracle), with ZERO
    * corpus scans when the index is fresh: the plan touches only the
    * three terms' postings rows (tok-equality pushed to the pruned
    * parquet scan — spec-pinned) and a ≤3-row vocabulary fetch for the
    * df literals. Exactness: n and df are the same exact integers the
    * scan-time operator aggregates, both engines fold the same
    * constants, and the per-document score expression is structurally
    * identical — so the indexed path is hash-equal to the oracle, not
    * just approximately right. */
  def searchIndexed(s: SparkSession, dir: String, indexPath: String): DataFrame = {
    if (!isFresh(s, dir, indexPath)) build(s, dir, indexPath)
    val n = freshMeta(s, dir, indexPath).getOrElse(
      throw new IllegalStateException(s"TextIndex at $indexPath vanished mid-query"))
    val terms = Seq("spark", "join", "stream")
    val dfMap = s.read
      .parquet(s"$indexPath/vocab")
      .filter(col("tok").isin(terms: _*))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val posts = s.read
      .parquet(s"$indexPath/postings")
      .filter(col("tok").isin(terms: _*))
    val pivots = terms.map(t =>
      coalesce(max(when(col("tok") === t, col("tf"))), lit(0L)).as(s"tf_$t"))
    val d = posts.groupBy("doc_id").agg(pivots.head, pivots.tail: _*)
    // same fixed term order and same df>0 guard as the scan-time operator
    val score: Column = terms
      .map { t =>
        val df = dfMap.getOrElse(t, 0L)
        if (df > 0) col(s"tf_$t") * log(lit(n.toDouble) / lit(df.toDouble))
        else lit(0.0)
      }
      .reduce(_ + _)
    d.select(
        col("doc_id"),
        col("tf_spark"),
        col("tf_join"),
        col("tf_stream"),
        score.as("sc"))
      .filter(col("sc") > 0)
      .orderBy(col("sc").desc, col("doc_id"))
      .limit(20)
      .select(
        col("doc_id"),
        col("tf_spark"),
        col("tf_join"),
        col("tf_stream"),
        round(col("sc"), 4).as("score"))
  }

  private[graft] def defaultPath(s: SparkSession, dir: String): String =
    CorpusOps.storePath(s, dir, "graft_text_index")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_search_idx" -> ((s, d) => searchIndexed(s, d, defaultPath(s, d))))

  /** Identical contract → identical oracle ([[GramIndex]]'s
    * dedup_incremental_idx convention). */
  val oracles: Map[String, String] = Map(
    "text_search_idx" -> TextAnalysis.searchSql)
}
