package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted rare-gram index of an established corpus — the artifact that
  * makes incremental admission ([[CorpusOps.dedupIncrementalIndexed]])
  * touch ONLY the index and the incoming batch, never the corpus text.
  *
  * The round-6 admission operator re-derived corpus grams on every call:
  * correct, but a full corpus scan per crawl. A training pipeline admits
  * batches far more often than the corpus changes, so the right
  * amortization is to persist, between crawls, exactly the two corpus
  * facts admission needs:
  *
  *   - `<path>/grams`:  one row per distinct corpus gram hash —
  *     `(gram BIGINT, df BIGINT, ds ARRAY<BIGINT>)` where `df` is the
  *     exact corpus document frequency and `ds` holds the packed
  *     (doc_id, n_grams) members ONLY while df ≤ 20 (built with the same
  *     [[graft.functions.CappedLongCollect]] the live pipeline uses —
  *     NULL past the cap). A gram hotter than the rarity cap can never
  *     produce candidate pairs (df only grows when a delta arrives), so
  *     the per-row payload is bounded at 21×8 bytes; cardinality is one
  *     row per distinct gram — dominated by df=1 singletons, a few
  *     percent of the corpus TEXT size in compressed parquet (sorted by
  *     gram via range partitioning), and the price of never re-scanning
  *     100 TB of text per crawl.
  *   - `<path>/hashes`: distinct `md5(text)` of the corpus — the exact
  *     stage's probe set, ~32 bytes per distinct document.
  *   - `<path>/meta`:   freshness stamp (the corpus table's file listing
  *     — [[PipelineCache.sourceStamp]]'s token) + the excluded batch
  *     source + the packing envelope, written via the Hadoop FileSystem
  *     so HDFS/object-store index locations work unchanged.
  *
  * Staleness contract: the stamp binds the index to the exact on-disk
  * state of the documents table it was built from. In this repo corpus
  * and batch share one table, so ANY table change (including appending
  * the next crawl) conservatively invalidates; a production deployment
  * with a separate corpus table stamps only that. Consumers check
  * [[isFresh]] and rebuild (or fail loudly) — never serve silently
  * stale candidates. Concurrency: [[build]] overwrites in place and the
  * meta file is written LAST, so a crash mid-build leaves a stale-by-
  * stamp index (rebuilt on next use), but a build racing a concurrent
  * READER of the same path can fail that reader's scan — serialize
  * builds against admissions per index path (the driver's usage is
  * sequential), or write to a versioned path and swap, as
  * [[graft.Sinks.upsertParquet]] does.
  *
  * Packing matches [[CorpusOps.dedupIncremental]]'s delta-flag scheme:
  * `dn = doc_id·2²¹ + n_grams·2 + flag` with flag 0 for corpus members,
  * so admission can concatenate index members with delta members and
  * reuse the same decode. doc_id < 2⁴², n_grams < 2²⁰, asserted loudly
  * at build.
  */
object GramIndex {

  private[graft] val Pack = 1048576L // 2^20

  /** The driver dataset's incoming-batch source label — the default
    * `deltaSource` everywhere a build/freshness call takes one, and the
    * binding [[graft.operators.CorpusOps.storeStatus]]'s census checks
    * (ONE constant, so the census can never disagree with [[isFresh]]
    * about which batch a default-built index excludes). */
  private[graft] val DefaultDeltaSource = "src19"

  /** df cap above which a gram cannot participate in rare-gram candidate
    * generation — must match the live pipeline's rarity band. */
  private[graft] val DfCap = 20

  /** On-disk format version, stored in meta and checked by [[isFresh]].
    * The stamp only tracks the DATA; this tracks the CODE: bump it
    * whenever gram hashing, the dn packing scheme, or the rarity cap
    * changes, or an index persisted by an older build would be served
    * false-fresh with incompatible content. */
  private[graft] val FormatVersion = s"v1:pack$Pack:df$DfCap"

  /** Build (overwrite) the index at `indexPath` from every document in
    * `dir` that is NOT the incoming batch (`source != deltaSource`;
    * NULL source = established corpus, same convention as admission). */
  def build(
      s: SparkSession,
      dir: String,
      indexPath: String,
      deltaSource: String = DefaultDeltaSource): Unit = {
    val corpus = Tables
      .documents(s, dir)
      .filter(coalesce(col("source") =!= deltaSource, lit(true)))
    val g = corpus
      .select(col("doc_id"), call_function("graft_grams", col("text")).as("garr"))
      .filter(col("garr").isNotNull)
      .filter(
        assert_true(
          size(col("garr")) < Pack && col("doc_id") >= 0 && col("doc_id") < (1L << 42),
          lit("GramIndex packing envelope exceeded: doc too large or doc_id out of range"))
          .isNull)
      .select(
        (col("doc_id") * Pack * 2 + size(col("garr")) * 2).as("dn"),
        explode(col("garr")).as("gram"))
    // one aggregation, bounded state, map-side combined — the same
    // no-straggler shape as Dedup.rarePairCounts, writing (gram, df, ds)
    // instead of expanding pairs
    g.groupBy("gram")
      .agg(
        count(lit(1)).as("df"),
        call_function("graft_collect_capped", col("dn"), lit(DfCap)).as("ds"))
      .repartitionByRange(col("gram"))
      .write
      .mode("overwrite")
      .parquet(s"$indexPath/grams")
    corpus
      .select(md5(col("text")).as("h"))
      .filter(col("h").isNotNull)
      .distinct()
      .write
      .mode("overwrite")
      .parquet(s"$indexPath/hashes")
    writeMeta(s, indexPath, Seq(stamp(dir), deltaSource, FormatVersion).mkString("\n"))
  }

  /** Fold the rows of `oldDelta` into the index — they are established
    * corpus once admitted — and re-bind the exclusion to `newDelta`: the
    * between-crawls maintenance step that closes the loop
    * (build → admit src19 → absorb → the next crawl arrives as src20).
    * Cost is one delta-side scan (filter-pushed) plus a LINEAR pass over
    * the index (full-outer gram merge + hash union) — the corpus text is
    * never re-scanned, which is the entire point of keeping the index.
    *
    * Post-condition (spec-pinned): the absorbed index is row-identical
    * to `build(..., newDelta)` from scratch. That equivalence requires
    * two loudly-enforced preconditions: the index is fresh for
    * `oldDelta` (a stale base would merge into the wrong corpus), and
    * the table holds no `newDelta` rows yet (they would be inside the
    * old index but excluded from a rebuild — absorb must run BEFORE the
    * next batch lands).
    *
    * Crash safety: the meta file is deleted FIRST and rewritten LAST, so
    * a crash anywhere inside the swap leaves a stale-by-stamp index that
    * the next consumer rebuilds — never a silently inconsistent one. */
  def absorb(
      s: SparkSession,
      dir: String,
      indexPath: String,
      oldDelta: String = DefaultDeltaSource,
      newDelta: String = "src20"): Unit = {
    if (!isFresh(s, dir, indexPath, oldDelta))
      throw new IllegalStateException(
        s"absorb: index at $indexPath is missing or stale for $dir (deltaSource=$oldDelta)")
    val docs = Tables.documents(s, dir)
    if (docs.filter(col("source") === newDelta).limit(1).count() > 0)
      throw new IllegalStateException(
        s"absorb: table already holds '$newDelta' rows — absorb must run before the " +
          "next batch lands (rebuild instead)")
    val batch = docs.filter(col("source") === oldDelta)
    val bg = batch
      .select(col("doc_id"), call_function("graft_grams", col("text")).as("garr"))
      .filter(col("garr").isNotNull)
      .filter(
        assert_true(
          size(col("garr")) < Pack && col("doc_id") >= 0 && col("doc_id") < (1L << 42),
          lit("GramIndex packing envelope exceeded: doc too large or doc_id out of range"))
          .isNull)
      .select(
        (col("doc_id") * Pack * 2 + size(col("garr")) * 2).as("dn"),
        explode(col("garr")).as("gram"))
      .groupBy("gram")
      .agg(
        count(lit(1)).as("df2"),
        call_function("graft_collect_capped", col("dn"), lit(DfCap)).as("ds2"))
    val empty = expr("CAST(array() AS ARRAY<BIGINT>)")
    val mergedDf = coalesce(col("df"), lit(0L)) + coalesce(col("df2"), lit(0L))
    val merged = grams(s, indexPath)
      .join(bg, Seq("gram"), "full_outer")
      .select(
        col("gram"),
        mergedDf.as("dfm"),
        // a side over its own cap has a NULL list, but then the merged
        // df is over the cap too and the WHEN discards the concat
        when(
          mergedDf <= DfCap,
          array_sort(concat(coalesce(col("ds"), empty), coalesce(col("ds2"), empty))))
          .otherwise(lit(null))
          .as("dsm"))
      .select(col("gram"), col("dfm").as("df"), col("dsm").as("ds"))
    val mergedHashes = hashes(s, indexPath)
      .unionByName(batch.select(md5(col("text")).as("h")).filter(col("h").isNotNull))
      .distinct()
    // invalidate before touching data; swap via staging (overwriting a
    // path Spark is currently reading from is rejected, and rightly so)
    val fs = metaPath(indexPath).getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(metaPath(indexPath), false)
    merged.repartitionByRange(col("gram")).write.mode("overwrite").parquet(s"$indexPath/grams_new")
    mergedHashes.write.mode("overwrite").parquet(s"$indexPath/hashes_new")
    def swap(name: String): Unit = {
      val live = new org.apache.hadoop.fs.Path(s"$indexPath/$name")
      val next = new org.apache.hadoop.fs.Path(s"$indexPath/${name}_new")
      fs.delete(live, true)
      if (!fs.rename(next, live))
        throw new java.io.IOException(s"absorb: rename $next -> $live failed")
    }
    swap("grams")
    swap("hashes")
    writeMeta(s, indexPath, Seq(stamp(dir), newDelta, FormatVersion).mkString("\n"))
  }

  /** True iff the index at `indexPath` exists and was built from the
    * CURRENT on-disk state of `dir`'s documents table with the same
    * excluded batch source. */
  def isFresh(
      s: SparkSession,
      dir: String,
      indexPath: String,
      deltaSource: String = DefaultDeltaSource): Boolean =
    readMeta(s, indexPath).exists { lines =>
      lines.length >= 3 && lines(0) == stamp(dir) && lines(1) == deltaSource &&
      lines(2) == FormatVersion
    }

  private[graft] def grams(s: SparkSession, indexPath: String): DataFrame =
    graft.sources.Tables.stableParquet(s, s"$indexPath/grams")

  private[graft] def hashes(s: SparkSession, indexPath: String): DataFrame =
    graft.sources.Tables.stableParquet(s, s"$indexPath/hashes")

  private[operators] def stamp(dir: String): String =
    PipelineCache.sourceStamp(dir, "documents.parquet")

  private[operators] def metaPath(indexPath: String) =
    new org.apache.hadoop.fs.Path(s"$indexPath/meta")

  private[operators] def writeMeta(s: SparkSession, indexPath: String, content: String): Unit = {
    val p = metaPath(indexPath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private[operators] def readMeta(s: SparkSession, indexPath: String): Option[Array[String]] = {
    val p = metaPath(indexPath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = org.apache.commons.io.IOUtils.toByteArray(in)
        Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8).split("\n", -1))
      } finally in.close()
    }
  }
}
