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
  *     — [[Similarity.embPq]]'s 8×256 code rows laid out for IVF-ADC
  *     serving, so probed-cell candidate reads touch slim code rows
  *     of c/K of the corpus and never the float vectors.
  *   - `<path>/pqcodebook` (v2): the 2048-row `(sub_id, cid, sv, c, ns)`
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

  /** v2 added the PQ artifacts (pqcodes/pqcodebook); v3 added the LSH
    * bucket body (lshbuckets); v4 added the graph-ANN bodies (nngraph +
    * gentries); v5 added the SEED graph body (g0graph) that makes
    * [[absorb]]'s O(delta) graph maintenance possible; v6 (r15 verdict
    * #1/#2) RE-DEFINES three artifact families — the codebook body
    * carries the seed-cell count `c`, pqcodes/pqcodebook encode IVF
    * RESIDUALS (a v5 pqcodebook quantizes raw vectors and would serve
    * wrong ADC answers against residual query tables), the graph gains
    * the first-refine body (g1graph), gentries are IVF-cell medoids and
    * the walk beam is 8; v7 (r16 verdict #1) widens the PQ subspace
    * codebooks 16 → 256 cells with four Lloyd refinement rounds
    * (`rpq8x256r4` — a v6 pqcodebook would serve 4-bit codes against
    * 8-bit query tables) — an older store is stale-by-version and
    * rebuilds, never serves a warm path with missing or
    * differently-defined bodies. */
  private[operators] def formatVersion(s: SparkSession): String =
    // rpq/lsh segments INTERPOLATE their constants (r17 review): a PqK /
    // PqRounds / probe-fan-out retune must flip the version by itself —
    // a hand-maintained literal would let an old store serve false-fresh
    s"v7:ivf16c:rpq8x${Similarity.PqK}r${Similarity.PqRounds}" +
      s":lsh6x4mp${graft.functions.LshProbes.Extra}:nn16s16b8h3:d${Similarity.embDim(s)}"

  private[operators] def stamp(dir: String): String =
    PipelineCache.sourceStamp(dir, "embeddings.parquet")

  /** Build (overwrite) the store at `path` from `dir`'s embeddings —
    * one [[Similarity.ivfCells]] pipeline (centroid + assignment passes),
    * landed partitioned.
    *
    * `excludeFrom`: the incoming-batch exclusion, by vec_id range
    * ([[GramIndex.build]]'s deltaSource convention adapted to the
    * embeddings table, which has no source column — new vectors arrive
    * with ids past the established corpus): when set, only `vec_id <
    * excludeFrom` is indexed and the bound is recorded in meta, so
    * [[absorb]] can later fold exactly that batch in. The driver path
    * builds with None (index everything). */
  def build(
      s: SparkSession,
      dir: String,
      path: String,
      excludeFrom: Option[Long] = None): Unit = {
    // invalidate meta FIRST (the CorpusProfile crash contract): a build
    // clobbering a CURRENTLY-FRESH store (operational re-index, same
    // stamp) that dies mid-write must not leave the old meta serving the
    // half-written bodies false-fresh — meta-written-last alone only
    // protects rebuilds that were themselves triggered by stamp drift
    val mp = GramIndex.metaPath(path)
    mp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(mp, false)
    val corpus = excludeFrom.foldLeft(Similarity.quantizedEmbeddings(s, dir)) {
      (df, from) => df.filter(col("vec_id") < from)
    }
    val (assigned, codebook) = Similarity.ivfCellsOf(corpus, 16)
    graft.Sinks.ivfPartitioned(assigned, s"$path/vectors")
    // store reads must never depend on the build session's frames: the
    // codebook lands as its K struct rows (v6: + the seed-cell count `c`
    // the residual encoding floor-divides by), re-collapsed at read time
    Similarity.codebookRows(codebook)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/codebook")
    // v6: the rounded ASSIGNED-cell centroids the residual PQ bodies
    // subtract — persisted so warm IVF-ADC serving derives its query
    // residuals without any corpus (or vectors-body) pass; the default
    // path rides the same stamp-cached frame the live queries use
    val rcents = excludeFrom match {
      case None => Similarity.ivfRcents(s, dir)
      case Some(_) => Similarity.roundedCentroids(Similarity.assignedCentRows(assigned))
    }
    rcents.coalesce(1).write.mode("overwrite").parquet(s"$path/rcentroids")
    // qsample derives from the build's own assigned frame (re-reading
    // $path/vectors here would crash on an all-gate-rejected corpus —
    // an empty partitionBy write has no readable schema) and stays a
    // parallel write: at corpus scale the 1% sample is itself large
    // (1 TB per 100 TB) — only the 16-row codebook coalesces
    assigned
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("qv"), col("nq"))
      .write.mode("overwrite").parquet(s"$path/qsample")
    // PQ artifacts (v2): the 8-byte-per-vector code rows land PARTITIONED
    // BY CELL like the vectors, so IVF-ADC serving prunes non-probed
    // cells at the reader; the 2048-row integer subspace codebook lands
    // beside them. On the default (no-exclusion) path the cell join
    // rides the stamp-cached slim assignment (the same frame
    // ann_ivfpq_topk / dedup_embedding_ivf share) and pqFrames is the
    // stamp-cached pair the live PQ queries use — a build right after a
    // live query re-reads both caches instead of re-scanning the corpus;
    // an exclusion build derives both from its own filtered corpus (the
    // caches hold full-corpus frames and must not leak into it).
    val sd = Similarity.embDim(s) / 8
    require(Similarity.embDim(s) % 8 == 0,
      s"VectorIndex PQ bodies need dim % 8 == 0, got ${Similarity.embDim(s)}")
    val (pqCents, pqAssigned, cellsSlim) = excludeFrom match {
      case None =>
        val (c, a) = Similarity.pqFrames(s, dir)
        (c, a, Similarity.ivfCellsSlimCached(s, dir))
      case Some(_) =>
        // v6: the PQ bodies encode IVF RESIDUALS — the exclusion build
        // derives them from its own filtered corpus's assignment
        val resid = Similarity.residualOf(assigned, rcents, "vec_id")
        val sub = Similarity.subspaceRows(resid, "vec_id", sd)
        val c = Similarity.pqCentroids(sub)
        (c, Similarity.pqAssigned(sub, c), assigned.select(col("vec_id"), col("cell")))
    }
    Similarity
      .pqCodes(pqAssigned)
      .join(cellsSlim, "vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/pqcodes")
    pqCents
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/pqcodebook")
    // LSH bucket body (v3): every vector's 6 table buckets, PARTITIONED
    // BY (t, b) — 96 partitions — so a probe of a query batch's bucket
    // set prunes unmatched buckets at the READER (the cell-partitioning
    // move applied to the hash tables; a single-query serve reads 6 of
    // 96 partitions). Bucket values are a pure function of qv (no
    // learned state), which is what makes absorb's union exact.
    val bucketPairs = Similarity.lshBucketPairs(assigned, "vec_id")
    bucketPairs.write.mode("overwrite").partitionBy("t", "b").parquet(s"$path/lshbuckets")
    // Graph-ANN bodies (v4): the LSH-seeded, NN-descent-refined corpus
    // kNN graph (nngraph) and the bounded deterministic walk entries
    // (gentries) — both PURE functions of the vector set, which is what
    // makes absorb's regeneration exact. The default path rides the same
    // stamp-cached construction the scan-time ann_graph_topk uses
    // (shared_cache); an exclusion build derives from its own filtered
    // frames with a one-shot local persist.
    val vecsSlim = assigned.select(col("vec_id"), col("qv"), col("nq"))
    val pin = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val gLocal: Option[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] =
      excludeFrom.map { _ =>
        val g0 = Similarity.nnSeedGraph(bucketPairs, vecsSlim).persist(pin)
        (g0, Similarity.nnRefine(g0, vecsSlim).persist(pin))
      }
    // the SEED graph and the FIRST refine round land as their own bodies
    // (v5/v6): [[absorb]]'s O(delta) maintenance needs each refine
    // stage's INPUT, not just the final output
    val (g0Frame, g1Frame, graph) = gLocal match {
      case None =>
        (Similarity.nnG0Cached(s, dir), Similarity.nnG1Cached(s, dir),
          Similarity.nnGraphCached(s, dir))
      case Some((g0, g1)) => (g0, g1, Similarity.nnRefine(g1, vecsSlim))
    }
    try {
      g0Frame.write.mode("overwrite").parquet(s"$path/g0graph")
      g1Frame.write.mode("overwrite").parquet(s"$path/g1graph")
      graph.write.mode("overwrite").parquet(s"$path/nngraph")
      // v6 gentries: the IVF-cell medoids (the walk's geometry-aware
      // entry points), derived from the build's own assignment/codebook
      Similarity
        .gEntriesOfAssigned(assigned, Similarity.codebookRows(codebook))
        .coalesce(1).write.mode("overwrite").parquet(s"$path/gentries")
    } finally gLocal.foreach { case (g0, g1) =>
      g0.unpersist(blocking = false); g1.unpersist(blocking = false)
    }
    // meta follows the house convention (stamp, info, version) plus the
    // recorded batch exclusion ("" = none) so store_status reads all
    // four stores with one shape
    GramIndex.writeMeta(
      s, path,
      Seq(stamp(dir), "k=16", formatVersion(s),
        excludeFrom.map(_.toString).getOrElse("")).mkString("\n"))
  }

  /** Fold the admitted vector batch `[oldFrom, newFrom)` into the store
    * and re-bind the exclusion to `newFrom` — [[GramIndex.absorb]]'s
    * between-crawls maintenance contract on the vector side: ONE
    * delta-range scan of the embeddings table (the vec_id bound is a
    * pushed parquet filter — row groups past the corpus prune on
    * min/max stats) plus a LINEAR pass over the store's own bodies; the
    * established corpus's float vectors are never re-read from the
    * source table.
    *
    * What makes this exact (spec-pinned row-identical to
    * `build(..., excludeFrom = Some(newFrom))`): every stored artifact
    * is an exact integer. Seed-cell centroid sums AND counts are
    * additive — old `(cv, c)` + the delta's seed sums equal a rebuild's
    * bit-for-bit — and re-assignment / re-coding against the merged
    * codebook reads (qv, nq) back from the store losslessly. The v6
    * RESIDUAL PQ bodies are NOT additive (the rounded centroid moves
    * with the merged sums, so every established vector's residual
    * changes): they are recomputed from the merged residual view — a
    * linear pass over the store's own slim rows, never the source
    * table, and identical to a rebuild's derivation by construction.
    * The other unavoidable linear cost is re-assigning EVERY vector
    * (new centroids can flip any vector's argmax cell — the honest
    * price of exact parity; an approximate deployment that pins old
    * assignments trades that for drift), but that pass too is over the
    * store's slim rows.
    *
    * Unlike the source-label convention, the RANGE convention needs no
    * "next batch already landed" guard: `build(excludeFrom=oldFrom)`
    * excluded EVERYTHING at or past `oldFrom`, so rows ≥ `newFrom`
    * (whenever they land) are outside both the base store and the
    * absorbed result, and parity with a `newFrom` rebuild holds
    * regardless.
    *
    * Crash safety: meta deleted FIRST, bodies staged to `*_new` and
    * swapped, meta rewritten LAST — a crash anywhere leaves a
    * stale-by-stamp (or stale-by-binding) store the next consumer
    * rebuilds ([[GramIndex.absorb]] verbatim). */
  def absorb(s: SparkSession, dir: String, path: String, oldFrom: Long, newFrom: Long): Unit = {
    require(oldFrom < newFrom, s"absorb: oldFrom $oldFrom must be < newFrom $newFrom")
    if (!isFresh(s, dir, path, Some(oldFrom)))
      throw new IllegalStateException(
        s"absorb: store at $path is missing or stale for $dir (excludeFrom=$oldFrom)")
    import s.implicits._
    val pin = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val delta = Similarity
      .quantizedEmbeddings(s, dir)
      .filter(col("vec_id") >= oldFrom && col("vec_id") < newFrom)
    def zipAdd(a: String, b: String) =
      when(col(a).isNull, col(b))
        .when(col(b).isNull, col(a))
        .otherwise(zip_with(col(a), col(b), _ + _))
    // merged IVF codebook: old seed sums/counts + delta seed sums/counts,
    // exact (both additive)
    val mergedCb = graft.sources.Tables.stableParquet(s, s"$path/codebook")
      .join(
        delta
          .groupBy((col("vec_id") % 16).cast("int").as("cell"))
          .agg(call_function("graft_vec_sum", col("qv")).as("cvd"), count(lit(1)).as("cd")),
        Seq("cell"), "full_outer")
      .select(
        col("cell"), zipAdd("cv", "cvd").as("cv"),
        (coalesce(col("c"), lit(0L)) + coalesce(col("cd"), lit(0L))).as("c"))
      .filter(Similarity.assertCentroidExact(col("cv"), "IVF centroid"))
      .withColumn("nc", Similarity.selfDot(col("cv")))
      // every multi-consumer frame below is PINNED: each staged write is
      // its own action, and without the persists the reassignment (a
      // full pass over the store) and the merged codebook re-run once
      // per consumer — the recomputation class the pqFrames cache fixed,
      // applied to the one-shot absorb
      .persist(pin)
    val codebook1 = Similarity.collapseCodebook(mergedCb)
    // every vector re-scored against the merged codebook: stored rows
    // (an empty base store's partitioned body has no readable schema —
    // stand in the typed empty frame) + the delta
    val stored =
      try graft.sources.Tables.stableParquet(s, s"$path/vectors").select(col("vec_id"), col("qv"), col("nq"))
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          s.emptyDataset[(Long, Array[Long], Long)].toDF("vec_id", "qv", "nq")
      }
    val allVecs = stored
      .unionByName(delta.select(col("vec_id"), col("qv"), col("nq")))
      .persist(pin)
    val reassigned = Similarity.ivfAssign(allVecs, codebook1).persist(pin)
    // v6 RESIDUAL PQ: the rounded centroid moves with the merged sums,
    // so every vector's residual changes and the old additive-sums merge
    // no longer applies — recompute the subspace codebook and codes from
    // the merged residual view (a linear pass over the store's own slim
    // rows; the source table's floats are still never re-read)
    val sd = Similarity.embDim(s) / 8
    val rcents1 = Similarity
      .roundedCentroids(Similarity.assignedCentRows(reassigned))
      .persist(pin)
    val resid = Similarity.residualOf(reassigned, rcents1, "vec_id").persist(pin)
    val mergedPq = Similarity
      .pqCentroids(Similarity.subspaceRows(resid, "vec_id", sd))
      .persist(pin)
    val newCodes = Similarity
      .pqCodes(Similarity.pqAssigned(Similarity.subspaceRows(resid, "vec_id", sd), mergedPq))
      .join(reassigned.select(col("vec_id"), col("cell")), "vec_id")
    // stage every body (their plans READ the live bodies — overwrite in
    // place would fail or corrupt), then swap; meta is already deleted
    val fs = GramIndex.metaPath(path).getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(GramIndex.metaPath(path), false)
    try {
      reassigned.write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors_new")
      mergedCb.coalesce(1).write.mode("overwrite").parquet(s"$path/codebook_new")
      graft.sources.Tables.stableParquet(s, s"$path/qsample")
        .unionByName(
          delta
            .filter(col("vec_id") % 100 === 0)
            .select(col("vec_id").as("query_id"), col("qv"), col("nq")))
        .write.mode("overwrite").parquet(s"$path/qsample_new")
      newCodes.write.mode("overwrite").partitionBy("cell").parquet(s"$path/pqcodes_new")
      mergedPq.coalesce(1).write.mode("overwrite").parquet(s"$path/pqcodebook_new")
      // LSH buckets: old rows + the delta's — bucket values depend only
      // on qv, so the union is row-identical to a rebuild's derivation
      val oldLsh =
        try graft.sources.Tables.stableParquet(s, s"$path/lshbuckets")
          .select(col("vec_id"), col("t").cast("int").as("t"), col("b").cast("int").as("b"))
        catch {
          case _: org.apache.spark.sql.AnalysisException =>
            s.emptyDataset[(Long, Int, Int)].toDF("vec_id", "t", "b")
        }
      val mergedLsh = oldLsh
        .unionByName(Similarity.lshBucketPairs(delta, "vec_id"))
        .persist(pin)
      try {
        mergedLsh.write.mode("overwrite").partitionBy("t", "b").parquet(s"$path/lshbuckets_new")
        // graph-ANN bodies at O(delta) (r15, two-round since v6): the
        // stored seed graph is spliced — only touched buckets re-pair,
        // only affected srcs re-rank, only their in-neighbor pivots
        // re-propose, and the first splice's re-rank set chains into the
        // second round — and the result is ROW-IDENTICAL to a full
        // regeneration (the monotone top-K and re-rank-set arguments in
        // [[Similarity.nnGraphDelta]]; the parity spec compares against
        // a rebuild byte for byte)
        val (g0New, g1New, g2New) = Similarity.nnGraphDelta(
          graft.sources.Tables.stableParquet(s, s"$path/g0graph"),
          graft.sources.Tables.stableParquet(s, s"$path/g1graph"),
          graft.sources.Tables.stableParquet(s, s"$path/nngraph"),
          oldLsh,
          Similarity.lshBucketPairs(delta, "vec_id"),
          allVecs,
          oldFrom)
        try {
          g0New.write.mode("overwrite").parquet(s"$path/g0graph_new")
          g1New.write.mode("overwrite").parquet(s"$path/g1graph_new")
          g2New.write.mode("overwrite").parquet(s"$path/nngraph_new")
          rcents1.coalesce(1).write.mode("overwrite").parquet(s"$path/rcentroids_new")
          Similarity.gEntriesOfAssigned(reassigned, mergedCb)
            .coalesce(1).write.mode("overwrite").parquet(s"$path/gentries_new")
        } finally {
          g0New.unpersist(blocking = false)
          g1New.unpersist(blocking = false)
        }
      } finally mergedLsh.unpersist(blocking = false)
    } finally
      Seq(reassigned, allVecs, mergedCb, mergedPq, resid, rcents1)
        .foreach(_.unpersist(blocking = false))
    def swap(name: String): Unit = {
      val live = new org.apache.hadoop.fs.Path(s"$path/$name")
      val next = new org.apache.hadoop.fs.Path(s"$path/${name}_new")
      fs.delete(live, true)
      if (!fs.rename(next, live))
        throw new java.io.IOException(s"absorb: rename $next -> $live failed")
    }
    Seq("vectors", "codebook", "rcentroids", "qsample", "pqcodes", "pqcodebook",
      "lshbuckets", "g0graph", "g1graph", "nngraph", "gentries").foreach(swap)
    GramIndex.writeMeta(
      s, path,
      Seq(stamp(dir), "k=16", formatVersion(s), newFrom.toString).mkString("\n"))
  }

  def isFresh(
      s: SparkSession,
      dir: String,
      path: String,
      excludeFrom: Option[Long] = None): Boolean =
    GramIndex.readMeta(s, path).exists(l =>
      l.length >= 4 && l(0) == stamp(dir) && l(2) == formatVersion(s) &&
        l(3) == excludeFrom.map(_.toString).getOrElse(""))

  /** [[Similarity.annIvf]]'s exact contract served from the store (same
    * probes, same rescore, same oracle); zero embeddings scans when
    * fresh — candidate reads touch only the probed cell partitions. */
  def annIndexed(s: SparkSession, dir: String, path: String): DataFrame = {
    if (!isFresh(s, dir, path)) build(s, dir, path)
    val codebook = Similarity.collapseCodebook(
      graft.sources.Tables.stableParquet(s, s"$path/codebook"))
    val qf = graft.sources.Tables.stableParquet(s, s"$path/qsample")
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
        graft.sources.Tables.stableParquet(s, s"$path/vectors").filter(col("cell").isin(cells.map(Int.box): _*))
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
    * partitions (slim code rows — the ADC trade persisted: the store
    * serves compressed candidates, never the 256-byte vectors), and the
    * per-query distance tables are computed from the stored qsample ×
    * the stored 2048-row integer pqcodebook. Exactness survives the store
    * round-trip because every persisted number is an exact integer
    * (codes, sum-vectors, counts, quantized query components) — the
    * float work happens at serve time through the same expressions the
    * scan-time operator uses. */
  def annIvfPqIndexed(s: SparkSession, dir: String, path: String): DataFrame = {
    if (!isFresh(s, dir, path)) build(s, dir, path)
    val codebook = Similarity.collapseCodebook(
      graft.sources.Tables.stableParquet(s, s"$path/codebook"))
    val qf = graft.sources.Tables.stableParquet(s, s"$path/qsample")
    val probes = ivfProbesCached(s, dir, path, codebook, qf)
    val cells = probes.select("cell").distinct().collect().map(_.getInt(0)).sorted
    if (cells.isEmpty) {
      // all-gate-rejected corpus: empty partitioned bodies have no
      // readable schema — return the scan-time operator's empty frame
      import s.implicits._
      s.emptyDataset[(Long, Long, Double, Int)]
        .toDF("query_id", "neighbor_id", "adist", "rk")
    } else {
      // v6: residual ADC tables per (query, probed cell) — the rounded
      // assigned-cell centroids read straight from the store's
      // rcentroids body, the residual subspace codebook is the stored
      // pqcodebook
      val dt = Similarity.pqQueryTablesFrom(
        probes.join(qf.select(col("query_id"), col("qv")), "query_id"),
        graft.sources.Tables.stableParquet(s, s"$path/rcentroids"),
        graft.sources.Tables.stableParquet(s, s"$path/pqcodebook"),
        Similarity.embDim(s) / 8)
      val cand = graft.sources.Tables.stableParquet(s, s"$path/pqcodes")
        .filter(col("cell").isin(cells.map(Int.box): _*))
        .join(broadcast(probes), Seq("cell"))
      Similarity.pqRank(cand.join(broadcast(dt), Seq("query_id", "cell")))
    }
  }

  /** [[Similarity.annLsh]]'s exact contract served from the store (same
    * bucket formula, same candidate union, same rescore, SAME oracle)
    * with ZERO embeddings scans when fresh: query buckets come from the
    * stored qsample through the same native kernel, the probed (t, b)
    * set collapses to an eager literal predicate on the PARTITION
    * columns (≤ 96 values — one driver fetch of the bounded query-bucket
    * frame), so candidate reads prune unmatched hash-table partitions
    * at the reader, and rescoring joins the store's own slim vectors
    * body — the source table is never touched.
    *
    * Bucket-skew policy: the stored partitions inherit whatever bucket
    * imbalance the corpus has — [[Similarity.skewLshBuckets]] censuses
    * the same (t, b) key this body partitions by; the same
    * `spark.graft.ann.lshBucketCap` knob splits the pruned body read
    * here through the same [[Similarity.saltedBucketJoin]] (default
    * 0 = off, results identical at any setting), with one
    * store-specific extra: a heavy bucket is also a heavy PARTITION,
    * so the census's salt_factor is simultaneously the file-split
    * factor a rebuild should apply to that bucket's body. */
  def annLshIndexed(s: SparkSession, dir: String, path: String): DataFrame = {
    if (!isFresh(s, dir, path)) build(s, dir, path)
    val qf =
      try graft.sources.Tables.stableParquet(s, s"$path/qsample")
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          import s.implicits._
          s.emptyDataset[(Long, Array[Long], Long)].toDF("query_id", "qv", "nq")
      }
    // MULTI-PROBE query expansion (the scan-time annLsh's own probe
    // derivation — 3 buckets per table, parity structural); the stored
    // index body stays one bucket per (vector, table)
    val queryBuckets = Similarity.lshProbePairs(qf, "query_id")
    // eager literal on the PARTITION columns: the probed bucket set is
    // bounded by the 6×16 domain, so one driver fetch turns the read
    // into reader-level partition pruning (the ann_ivf_idx move)
    val probed = queryBuckets.select((col("t") * 16 + col("b")).cast("long").as("tb"))
      .distinct().collect().map(_.getLong(0)).sorted
    if (probed.isEmpty) {
      import s.implicits._
      s.emptyDataset[(Long, Long, Double, Int)]
        .toDF("query_id", "neighbor_id", "cos_sim", "rk")
    } else {
      // candidate build + exact rescore are [[Similarity]]'s own shared
      // LSH stages ("parity structural" — the scan-time operator and
      // this store path cannot drift), fed from the store's bodies
      Similarity.lshRescore(
        Similarity.lshCandidates(
          Similarity.saltedBucketJoin(
            graft.sources.Tables
              .stableParquet(s, s"$path/lshbuckets")
              .filter((col("t") * 16 + col("b")).cast("long").isin(probed.map(Long.box): _*)),
            queryBuckets,
            "vec_id",
            Similarity.lshBucketCap(s))),
        graft.sources.Tables.stableParquet(s, s"$path/vectors"),
        qf)
    }
  }

  /** [[Similarity.annGraph]]'s exact contract served from the store
    * (same entries, same 2-hop beam walk, same rescore, SAME oracle)
    * with ZERO embeddings scans when fresh: the walk is
    * [[Similarity.graphWalk]] VERBATIM ("parity structural"), fed the
    * persisted NN-descent-refined graph body, the ≤ 16-row gentries
    * body and the store's slim vectors — the source table is never
    * touched. Access is query-dependent (a walk's frontier can land
    * anywhere), so unlike the cell/bucket paths there is no partition
    * literal to push: each hop BROADCASTS the bounded frontier
    * (≤ beam·|queries| rows) into one scan of the 16-byte-row graph
    * body — at 100 TB that is two sequential passes over ids+sims,
    * never a corpus-sized shuffle and never the float vectors. */
  def annGraphIndexed(s: SparkSession, dir: String, path: String): DataFrame = {
    if (!isFresh(s, dir, path)) build(s, dir, path)
    import s.implicits._
    def bodyOr(name: String, empty: => DataFrame): DataFrame =
      try graft.sources.Tables.stableParquet(s, s"$path/$name")
      catch { case _: org.apache.spark.sql.AnalysisException => empty }
    val qf = bodyOr("qsample",
      s.emptyDataset[(Long, Array[Long], Long)].toDF("query_id", "qv", "nq"))
    val entries = bodyOr("gentries",
      s.emptyDataset[(Long, Array[Long], Long)].toDF("vec_id", "qv", "nq"))
    val graph = bodyOr("nngraph",
      s.emptyDataset[(Long, Long, Double)].toDF("src", "dst", "cos_sim"))
    val vecs = bodyOr("vectors",
      s.emptyDataset[(Long, Array[Long], Long)].toDF("vec_id", "qv", "nq"))
      .select(col("vec_id"), col("qv"), col("nq"))
    // hop frames cached per (corpus stamp, STORE PATH): the digest keeps
    // two stores of one dir from serving each other's frontiers (the
    // ivfProbesCached rule)
    val pathTag = java.security.MessageDigest
      .getInstance("MD5")
      .digest(path.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_))
      .mkString
    Similarity.graphWalk(graph.select("src", "dst"), entries, vecs, qf,
      hopCache = Some((s, dir, s"nn_walk_d${Similarity.embDim(s)}_p$pathTag")))
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
    "ann_ivfpq_idx" -> ((s, d) => annIvfPqIndexed(s, d, defaultPath(s, d))),
    "ann_lsh_idx" -> ((s, d) => annLshIndexed(s, d, defaultPath(s, d))),
    "ann_graph_idx" -> ((s, d) => annGraphIndexed(s, d, defaultPath(s, d))))

  /** Identical contracts → identical oracles (the [[TextIndex]]
    * convention): the store paths answer the scan-time operators'
    * DuckDB replays hash-equal, not approximately. */
  val oracles: Map[String, String] = Map(
    "ann_ivf_idx" -> Similarity.annIvfSql,
    "ann_ivfpq_idx" -> Similarity.annIvfPqSql,
    "ann_lsh_idx" -> Similarity.annLshSql,
    "ann_graph_idx" -> Similarity.annGraphSql)
}
