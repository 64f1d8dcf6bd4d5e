package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF vector store — the fourth between-crawls store beside
  * [[GramIndex]] / [[TextIndex]] / [[CorpusProfile]], closing the round-8
  * verdict's "ANN serving is batch-shaped" note: [[Similarity.annIvf]] is
  * the scan-time oracle anchor (three corpus passes per call — centroid,
  * assignment, query sample), but a serving pipeline probes its vectors
  * far more often than the corpus changes. Persist what probing needs:
  *
  *   - `<path>/vectors`: `(vec_id, qv, nq)` PARTITIONED BY `cell` —
  *     [[graft.Sinks.ivfPartitioned]]'s layout, so a probe of c cells
  *     reads c/K of the store at the READER (PartitionFilters, no data
  *     touched for the rest).
  *   - `<path>/codebook`: `(cell, cv, nc)` — K exact integer centroid
  *     sum-vectors (cosine is scale-invariant, no float division).
  *   - `<path>/qsample`: the 1% query-vector sample the driver query
  *     scores (a real serving deployment swaps in its own query batch —
  *     the frame shape `(query_id, qv, nq)` is the API).
  *   - `<path>/pqcodes` (v2): `(vec_id, c0..c7)` PARTITIONED BY `cell`
  *     — [[Similarity.embPq]]'s 8×16 code rows laid out for IVF-ADC
  *     serving, so probed-cell candidate reads touch 36-byte code rows
  *     of c/K of the corpus and never the float vectors.
  *   - `<path>/pqcodebook` (v2): the 128-row `(sub_id, cid, sv, c, ns)`
  *     exact-integer subspace codebook the ADC distance tables are
  *     computed from.
  *   - `<path>/meta`: freshness stamp + FORMAT VERSION carrying K and
  *     the embedding dim, so a knob change can never serve a
  *     mismatched index false-fresh ([[GramIndex]]'s convention).
  *
  * Serving ([[annIndexed]]) is [[Similarity.annIvf]]'s contract served
  * with ZERO embeddings scans when fresh: probes come from the shared
  * [[Similarity.ivfProbes]] stage (parity structural), the probed cell
  * set collapses to an EAGER LITERAL `isin` filter on the partition
  * column (≤ K values via one driver fetch of the tiny probe frame —
  * the graph_pagerank eager-literal move), so candidate reads prune
  * non-probed cells at the reader, and rescoring is the shared
  * [[Similarity.ivfRescore]]. Store contents are the exact frames the
  * scan-time operator computes, so the indexed path answers hash-equal
  * to [[Similarity.annIvfSql]] — the same oracle, not a weaker one.
  *
  * Staleness/concurrency follow [[TextIndex]] verbatim: meta written
  * LAST (crash mid-build ⇒ stale-by-stamp, next call rebuilds); builds
  * racing readers of one path must serialize or stage-and-swap.
  */
object VectorIndex {

  /** v2 adds the PQ artifacts (pqcodes/pqcodebook) to the store — a v1
    * store is stale-by-version and rebuilds, never serves the IVF-ADC
    * path with missing bodies. */
  private[operators] def formatVersion(s: SparkSession): String =
    s"v2:ivf16:pq8x16:d${Similarity.embDim(s)}"

  private[operators] def stamp(dir: String): String =
    PipelineCache.sourceStamp(dir, "embeddings.parquet")

  /** Build (overwrite) the store at `path` from `dir`'s embeddings —
    * one [[Similarity.ivfCells]] pipeline (centroid + assignment passes),
    * landed partitioned. */
  def build(s: SparkSession, dir: String, path: String): Unit = {
    // invalidate meta FIRST (the CorpusProfile crash contract): a build
    // clobbering a CURRENTLY-FRESH store (operational re-index, same
    // stamp) that dies mid-write must not leave the old meta serving the
    // half-written bodies false-fresh — meta-written-last alone only
    // protects rebuilds that were themselves triggered by stamp drift
    val mp = GramIndex.metaPath(path)
    mp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(mp, false)
    val (assigned, codebook) = Similarity.ivfCells(s, dir, 16)
    graft.Sinks.ivfPartitioned(assigned, s"$path/vectors")
    // store reads must never depend on the build session's frames: the
    // codebook lands as its K struct rows, re-collapsed at read time
    codebook
      .select(explode(col("cb")).as("c"))
      .select(col("c.cell").as("cell"), col("c.cv").as("cv"), col("c.nc").as("nc"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/codebook")
    // qsample derives from the build's own assigned frame (re-reading
    // $path/vectors here would crash on an all-gate-rejected corpus —
    // an empty partitionBy write has no readable schema) and stays a
    // parallel write: at corpus scale the 1% sample is itself large
    // (1 TB per 100 TB) — only the 16-row codebook coalesces
    assigned
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("qv"), col("nq"))
      .write.mode("overwrite").parquet(s"$path/qsample")
    // PQ artifacts (v2): the 4-byte-per-vector code rows land PARTITIONED
    // BY CELL like the vectors, so IVF-ADC serving prunes non-probed
    // cells at the reader; the 128-row integer subspace codebook lands
    // beside them. The cell join rides the stamp-cached slim assignment
    // (the same frame ann_ivfpq_topk / dedup_embedding_ivf share), and
    // pqFrames is the stamp-cached pair the live PQ queries use — a
    // build right after a live query re-reads both caches instead of
    // re-scanning the corpus.
    val (pqCents, pqAssigned) = Similarity.pqFrames(s, dir)
    Similarity
      .pqCodes(pqAssigned)
      .join(Similarity.ivfCellsSlimCached(s, dir), "vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/pqcodes")
    pqCents
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/pqcodebook")
    // meta follows the house 3-line convention (stamp, info, version) so
    // store_status reads all four stores with one shape
    GramIndex.writeMeta(
      s, path, Seq(stamp(dir), "k=16", formatVersion(s)).mkString("\n"))
  }

  def isFresh(s: SparkSession, dir: String, path: String): Boolean =
    GramIndex.readMeta(s, path).exists(l =>
      l.length >= 3 && l(0) == stamp(dir) && l(2) == formatVersion(s))

  /** [[Similarity.annIvf]]'s exact contract served from the store (same
    * probes, same rescore, same oracle); zero embeddings scans when
    * fresh — candidate reads touch only the probed cell partitions. */
  def annIndexed(s: SparkSession, dir: String, path: String): DataFrame = {
    if (!isFresh(s, dir, path)) build(s, dir, path)
    val codebook = s.read.parquet(s"$path/codebook")
      .agg(array_sort(collect_list(struct(col("cell"), col("cv"), col("nc")))).as("cb"))
    val qf = s.read.parquet(s"$path/qsample")
    val probes = ivfProbesCached(s, dir, path, codebook, qf)
    // eager literal: the probed cell set (≤ 16 values) becomes a static
    // partition filter, so the vectors read prunes at the reader instead
    // of waiting on runtime pruning through the broadcast join
    val cells = probes.select("cell").distinct().collect().map(_.getInt(0)).sorted
    if (cells.isEmpty) {
      // all-gate-rejected corpus: the vectors body was an EMPTY
      // partitioned write (no readable schema) — return the scan-time
      // operator's empty frame instead of crashing on schema inference
      import s.implicits._
      s.emptyDataset[(Long, Long, Double, Int)]
        .toDF("query_id", "neighbor_id", "cos_sim", "rk")
    } else {
      val cand =
        s.read.parquet(s"$path/vectors").filter(col("cell").isin(cells.map(Int.box): _*))
      Similarity.ivfRescore(cand, probes, qf)
    }
  }

  /** [[Similarity.annIvfPq]]'s exact contract (the IVF-ADC composition)
    * served from the store — same probes, same ADC tables, same
    * fixed-order 8-lookup rank, same oracle — with ZERO embeddings scans
    * when fresh: probes ride the SAME cached probe frame as
    * [[annIndexed]] (one tag — warm IVF and IVF-ADC serving share it),
    * the probed cell set collapses to the same eager literal partition
    * filter, candidate reads touch only the probed cells' `pqcodes`
    * partitions (36-byte code rows — the ADC trade persisted: the store
    * serves compressed candidates, never the 256-byte vectors), and the
    * per-query distance tables are computed from the stored qsample ×
    * the stored 128-row integer pqcodebook. Exactness survives the store
    * round-trip because every persisted number is an exact integer
    * (codes, sum-vectors, counts, quantized query components) — the
    * float work happens at serve time through the same expressions the
    * scan-time operator uses. */
  def annIvfPqIndexed(s: SparkSession, dir: String, path: String): DataFrame = {
    if (!isFresh(s, dir, path)) build(s, dir, path)
    val codebook = s.read.parquet(s"$path/codebook")
      .agg(array_sort(collect_list(struct(col("cell"), col("cv"), col("nc")))).as("cb"))
    val qf = s.read.parquet(s"$path/qsample")
    val probes = ivfProbesCached(s, dir, path, codebook, qf)
    val cells = probes.select("cell").distinct().collect().map(_.getInt(0)).sorted
    if (cells.isEmpty) {
      // all-gate-rejected corpus: empty partitioned bodies have no
      // readable schema — return the scan-time operator's empty frame
      import s.implicits._
      s.emptyDataset[(Long, Long, Double, Int)]
        .toDF("query_id", "neighbor_id", "adist", "rk")
    } else {
      val dt = Similarity.pqQueryTablesFrom(
        qf, s.read.parquet(s"$path/pqcodebook"), Similarity.embDim(s) / 8)
      val cand = s.read.parquet(s"$path/pqcodes")
        .filter(col("cell").isin(cells.map(Int.box): _*))
        .join(broadcast(probes), Seq("cell"))
      Similarity.pqRank(cand.join(broadcast(dt), "query_id"))
    }
  }

  /** The probe frame is consumed twice (cell literal + rescore join) —
    * stamp-cached so the second consumer reads ≤ 4·|queries| cached rows
    * instead of re-scoring the sample ([[PipelineCache]]'s contract:
    * rebuilds when the embeddings table changes on disk). The STORE PATH
    * is folded into the tag: two stores of the same dir (a temp-path
    * build beside the default path) must not serve each other's probe
    * frames — the cached lineage reads path-specific qsample/codebook
    * files, and a recompute-from-lineage after the other path is deleted
    * would throw (the dim-in-tag rule, applied to the path axis). */
  private def ivfProbesCached(
      s: SparkSession,
      dir: String,
      path: String,
      codebook: DataFrame,
      qf: DataFrame): DataFrame = {
    // collision-resistant tag: a 32-bit String.hashCode collision between
    // two store paths would serve one store's probe lineage for the other
    // — use the full MD5 of the path (the storePath digest convention)
    val pathTag = java.security.MessageDigest
      .getInstance("MD5")
      .digest(path.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_))
      .mkString
    PipelineCache.cached(
      s"ivf_store_probes_d${Similarity.embDim(s)}_p$pathTag", s, dir, "embeddings.parquet")(
      Similarity.ivfProbes(qf, codebook))
  }

  private[graft] def defaultPath(s: SparkSession, dir: String): String =
    CorpusOps.storePath(s, dir, "graft_vector_index")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_ivf_idx" -> ((s, d) => annIndexed(s, d, defaultPath(s, d))),
    "ann_ivfpq_idx" -> ((s, d) => annIvfPqIndexed(s, d, defaultPath(s, d))))

  /** Identical contracts → identical oracles (the [[TextIndex]]
    * convention): the store paths answer the scan-time operators'
    * DuckDB replays hash-equal, not approximately. */
  val oracles: Map[String, String] = Map(
    "ann_ivf_idx" -> Similarity.annIvfSql,
    "ann_ivfpq_idx" -> Similarity.annIvfPqSql)
}
