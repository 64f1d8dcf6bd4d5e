package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The TRAINABLE ARTIFACT — the step the rest of the pipeline exists for:
  * apply the learned BPE merges ([[TextAnalysis.bpeTrain]]) to every
  * document, concatenate the token stream in deterministic order, cut
  * it into fixed-length training sequences, and land them split-
  * partitioned ([[graft.Sinks.trainingExport]]) — what a trainer's data
  * loader actually reads. The reference engine (main.py) stops at samples
  * and charts; this closes the gap between "analytics over a corpus" and
  * "tensors into a trainer".
  *
  * Three operators:
  *   - [[tokenizeIds]] — per-document token-id arrays (APPLY side of BPE;
  *     the FIT side is [[TextAnalysis.bpeTrain]]).
  *   - [[packRows]] — the whitespace-token materialization of
  *     [[CorpusOps.corpusPack]]'s placement metadata: actual sequence
  *     rows with an md5 content fingerprint, DuckDB-oracle-exact (the
  *     gapless-tiling proof that the placement arithmetic and the
  *     materialized content agree).
  *   - [[packIds]] — the end artifact: per-SPLIT packed token-id rows
  *     (train/val/test assigned by [[CorpusOps.splitLabel]]'s content
  *     hash BEFORE packing, so a sequence can never mix train and test
  *     tokens), exported via [[packedTrainingExport]].
  *
  * Id scheme (byte-level-BPE convention, public knowledge): a
  * single-character symbol's id is its code point ([[ascii]]'s numeric
  * value); a merged token's id is 0x110000 + merge rank — past the top of
  * the Unicode range, so the two namespaces can never collide and ids are
  * stable across corpora without a vocabulary scan. String-keyed merges
  * conflate two merge paths yielding the same text (min rank wins), the
  * same declared limitation as [[TextAnalysis.bpeTrain]].
  */
object Training {

  /** Merged-token ids start past the Unicode code-point range. */
  private[operators] val MergedIdBase = 0x110000

  /** Learned merge table (rank, left, right), collected once per source
    * stamp via [[PipelineCache]] — [[TextAnalysis.bpeTrain]]'s M driver
    * rounds run once and every consumer ([[tokenizeIds]], [[packIds]])
    * reuses the ≤ M-row result until documents.parquet changes. */
  private def mergeTable(s: SparkSession, dir: String): Seq[(Int, String, String)] =
    PipelineCache
      .cached("bpe_merge_table", s, dir, "documents.parquet")(TextAnalysis.bpeTrain(s, dir))
      .collect()
      .toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)

  /** Token-id array for one text column: split on spaces, drop empty
    * words, expand each word to symbols, fold every learned merge in
    * rank order (greedy left-to-right — [[TextAnalysis.bpeMergePass]]'s
    * semantics), then map symbols to ids. NULL text tokenizes to zero
    * tokens. Pure narrow map via the native `graft_bpe_ids` kernel
    * ([[graft.functions.BpeIds]]) with the ≤ M-row merge table folded in
    * as literal arrays — zero joins, zero shuffles, one static call per
    * row. (The declarative M-deep `transform`/`aggregate` nest this
    * replaces ran on the interpreted higher-order-function path:
    * measured ~15 s to materialize a 1.5 MB corpus vs sub-second
    * native — the MinHash64 story on the trainable-artifact kernel.
    * Semantics pinned by TrainingSpec's reference tokenizer + fuzz.) */
  private def tokenIdsCol(merges: Seq[(Int, String, String)], text: Column): Column = {
    val sorted = merges.sortBy(_._1)
    call_function(
      "graft_bpe_ids",
      text,
      typedLit(sorted.map(_._2)),
      typedLit(sorted.map(_._3)),
      typedLit(sorted.map(_._1)))
  }

  /** Per-document BPE tokenization with the corpus's own learned merges —
    * doc_id, id count, how many ids are merged (multi-char) tokens, and
    * the id array itself: the LIBRARY API a pipeline composes (the raw
    * arrays feed [[packIds]] and any downstream tokenizer consumer).
    * Pinned exactly by a plain-Scala reference tokenizer in the spec —
    * [[TextAnalysis.bpeTrain]]'s discipline applied to the APPLY side.
    *
    * Scale shape: [[TextAnalysis.bpeTrain]]'s corpus scan + M bounded
    * vocab rounds run ONCE per source stamp (shared via
    * [[PipelineCache]]); tokenization itself is a narrow codegen'd map —
    * no join, output one row per doc, NO output sort (the driver's
    * rows-only check needs none and a per-doc global sort is exactly the
    * presentation cost the event family shed). The only shuffle is
    * [[balancedDocs]]' conditional rebalance, a no-op whenever the
    * reader already splits the corpus. */
  def tokenizeIdsRaw(s: SparkSession, dir: String): DataFrame = {
    val merges = mergeTable(s, dir)
    Tables
      .documentsBalanced(s, dir)
      .select(col("doc_id"), tokenIdsCol(merges, col("text")).as("input_ids"))
      .select(
        col("doc_id"),
        size(col("input_ids")).cast("long").as("n_ids"),
        size(filter(col("input_ids"), i => i >= MergedIdBase)).cast("long").as("n_merged"),
        col("input_ids"))
  }

  /** md5 of the comma-joined decimal id array — the driver-hashable
    * FINGERPRINT of a token-id payload ([[packRows]]'s seq_md5 move):
    * raw ARRAY<INT> cells crash the driver checker's row sort, and the
    * fingerprint carries the identical information for an equality
    * check. Spec-pinned against a JVM-side reference digest. */
  private[operators] def idsMd5(ids: Column): Column =
    md5(concat_ws(",", ids.cast("array<string>")).cast("binary"))

  /** Driver-facing projection of [[tokenizeIdsRaw]]: the scalar stats
    * plus `ids_md5` in place of the raw array (rows-only check — the
    * greedy in-array merge fold has no portable-SQL rendering; the raw
    * arrays stay in the library API). */
  def tokenizeIds(s: SparkSession, dir: String): DataFrame =
    tokenizeIdsRaw(s, dir)
      .select(col("doc_id"), col("n_ids"), col("n_merged"), idsMd5(col("input_ids")).as("ids_md5"))

  /** Fragment-and-reassemble: cut each document's payload array into the
    * length-`L` sequences it spans (placement arithmetic =
    * [[CorpusOps.corpusPack]]'s, on the exclusive prefix `__ex`), then
    * group fragments by sequence and flatten them back in offset order.
    * One explode (≈ payload/L + one fragment per doc), ONE shuffle on
    * (partCols, seq_id); per-sequence state is bounded by L tokens +
    * its fragment structs — never corpus-proportional.
    *
    * Input: partCols ++ (doc_id, `payload` array with ≥ 1 element,
    * __ex). Output: partCols ++ (seq_id, n_docs, first_doc_id,
    * last_doc_id, payload). Fragment offsets within one sequence are
    * strictly increasing across docs (every packed doc has ≥ 1 token),
    * so the array_sort-by-struct reassembly is total and deterministic. */
  /** The fragment stage of [[packSequences]], exposed for
    * [[seqBounds]]: one row per (doc, sequence it spans) with the
    * fragment's global offset and payload slice. */
  private def fragments(
      t: DataFrame,
      L: Long,
      partCols: Seq[String],
      payload: String): DataFrame =
    t.select(
        (partCols.map(col) ++ Seq(
          col("doc_id"),
          col("__ex"),
          col(payload).as("__pl"),
          explode(expr(s"sequence(__ex DIV $L, (__ex + size($payload) - 1) DIV $L)"))
            .as("seq_id"))): _*)
      .select(
        (partCols.map(col) ++ Seq(
          col("seq_id"),
          col("doc_id"),
          expr(s"greatest(seq_id * $L, __ex)").as("g_off"),
          expr(
            s"slice(__pl, CAST(greatest(seq_id * $L, __ex) - __ex + 1 AS INT), " +
              s"CAST(least((seq_id + 1) * $L, __ex + size(__pl)) - greatest(seq_id * $L, __ex) AS INT))")
            .as("frag"))): _*)

  private def packSequences(
      t: DataFrame,
      L: Long,
      partCols: Seq[String],
      payload: String): DataFrame =
    fragments(t, L, partCols, payload)
      .groupBy((partCols :+ "seq_id").map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc_id"),
        max(col("doc_id")).as("last_doc_id"),
        flatten(
          transform(
            array_sort(collect_list(struct(col("g_off"), col("doc_id"), col("frag")))),
            f => f("frag"))).as("payload"))

  /** Materialized fixed-length sequence rows over WHITESPACE tokens — the
    * content that [[CorpusOps.corpusPack]]'s per-doc placement metadata
    * describes, actually assembled: sequence id, token/doc counts, the
    * contributing doc range, and the md5 of the space-joined sequence
    * text. Oracle-exact against DuckDB building the same sequences from
    * a global token numbering — the fingerprint match proves the
    * distributed fragment reassembly is bit-identical to the sequential
    * definition, gaplessly tiling the corpus (every sequence exactly L
    * tokens except the last).
    *
    * Token contract mirrors [[CorpusOps.corpusPack]] exactly: split on
    * single spaces (empty tokens from runs of spaces count), docs empty
    * after trim excluded — the two operators describe/materialize the
    * SAME packing, spec-pinned.
    *
    * Scale shape: [[CorpusOps.exclusivePrefix]]'s two-phase prefix (no
    * un-partitioned window), then [[packSequences]]'s one explode + one
    * seq_id shuffle; output is tokens/L rows, payload bounded by L. The
    * trailing orderBy is presentation for the tokens/L-row result. */
  def packRows(s: SparkSession, dir: String): DataFrame = {
    val L = CorpusOps.packSeqLen(s)
    val t = Tables
      .documents(s, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
    packSequences(CorpusOps.exclusivePrefix(s, t, "doc_id", "n_tokens"), L, Nil, "toks")
      .select(
        col("seq_id"),
        size(col("payload")).cast("long").as("n_tokens"),
        col("n_docs"),
        col("first_doc_id"),
        col("last_doc_id"),
        md5(concat_ws(" ", col("payload")).cast("binary")).as("seq_md5"))
  }

  val packRowsSql: String =
    """WITH t AS (
         SELECT doc_id, string_split(text, ' ') AS toks
         FROM documents WHERE LENGTH(TRIM(text)) > 0),
       c AS (
         SELECT doc_id, toks,
                COALESCE(SUM(len(toks)) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ex
         FROM t),
       x AS (SELECT doc_id, ex, toks,
                    UNNEST(generate_series(1, CAST(len(toks) AS BIGINT))) AS i
             FROM c),
       tok AS (SELECT doc_id, ex + i - 1 AS g, toks[CAST(i AS INT)] AS tok FROM x)
       SELECT CAST(g // 2048 AS BIGINT) AS seq_id,
              CAST(COUNT(*) AS BIGINT) AS n_tokens,
              CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
              MIN(doc_id) AS first_doc_id,
              MAX(doc_id) AS last_doc_id,
              md5(string_agg(tok, ' ' ORDER BY g)) AS seq_md5
       FROM tok GROUP BY 1 ORDER BY seq_id"""

  /** The end-to-end trainable artifact: BPE token-id sequences of exactly
    * `spark.graft.corpus.packSeqLen` ids (default 2048), packed PER
    * SPLIT — [[CorpusOps.splitLabel]]'s content-hash train/val/test
    * assignment is stamped in the same scan BEFORE packing, so by
    * construction no sequence ever mixes tokens across splits (pack
    * train and test together and every boundary sequence leaks). Within
    * each split, sequences tile the split's documents gaplessly in
    * doc_id order; all-but-the-last are exactly L ids. This is the
    * LIBRARY API carrying the raw arrays (what [[packedTrainingExport]]
    * lands); the driver-facing [[packIds]] fingerprints the payload.
    * Rows-only for the driver (BPE ids are not portable SQL); the spec
    * pins per-split gapless coverage against [[tokenizeIdsRaw]] and the
    * exact-L invariant.
    *
    * Scale shape: the corpus is TOKENIZED ONCE — the tokenized frame is
    * stamp-cached ([[PipelineCache]], MEMORY_AND_DISK) because
    * [[CorpusOps.exclusivePrefix]] necessarily drives three jobs over
    * it (quantile bounds, per-(split, bucket) totals, the consumed
    * plan) and the M-deep merge fold is the dominant per-row cost;
    * without the cache each job would re-tokenize. That materialized
    * tokenize-then-pack staging is the standard petabyte pipeline
    * shape. Then [[packSequences]]'s one explode + one (split, seq_id)
    * shuffle; the id payload crosses that one shuffle — it IS the
    * artifact; no corpus-sized sort anywhere (sequences land unordered;
    * the sink partitions by split, [[graft.Sinks.trainingExport]]'s
    * layout). */
  def packIdsRaw(s: SparkSession, dir: String): DataFrame = {
    val L = CorpusOps.packSeqLen(s)
    // the cached frame is the BARE tokenized projection — n_ids and the
    // empty-doc filter live ABOVE the cache, not inside it: a filter on
    // size(input_ids) inside the build gets pushed below the projection,
    // where it re-evaluates the whole merge fold per predicate check
    // (measured 3× the tokenize cost cold, ~8× through the columnar
    // cache build); above the InMemoryRelation, size() reads the cached
    // array for pennies
    val tok = PipelineCache.cached("pack_ids_tok", s, dir, "documents.parquet") {
      val merges = mergeTable(s, dir)
      Tables
        .documentsBalanced(s, dir)
        .select(
          col("doc_id"),
          CorpusOps.splitLabel(col("text")).as("split"),
          tokenIdsCol(merges, col("text")).as("input_ids"))
    }
    val t = tok
      .withColumn("n_ids", size(col("input_ids")).cast("long"))
      .filter(col("n_ids") > 0)
    packSequences(
      CorpusOps.exclusivePrefix(s, t, "doc_id", "n_ids", Seq("split")),
      L,
      Seq("split"),
      "input_ids")
      .select(
        col("split"),
        col("seq_id"),
        size(col("payload")).cast("long").as("n_ids"),
        col("n_docs"),
        col("first_doc_id"),
        col("last_doc_id"),
        col("payload").as("input_ids"))
  }

  /** Driver-facing projection of [[packIdsRaw]]: the per-split placement
    * columns plus `ids_md5` in place of the raw id array (the
    * [[tokenizeIds]] fingerprint move — rows-only for the driver, raw
    * arrays stay in the library API / export path). */
  def packIds(s: SparkSession, dir: String): DataFrame =
    packIdsRaw(s, dir)
      .select(
        col("split"),
        col("seq_id"),
        col("n_ids"),
        col("n_docs"),
        col("first_doc_id"),
        col("last_doc_id"),
        idsMd5(col("input_ids")).as("ids_md5"))

  /** Land [[packIdsRaw]] split-partitioned: `path/split=train/...` parquet
    * a trainer reads with reader-level val/test pruning — the
    * [[graft.Sinks.trainingExport]] layout carrying actual token-id
    * sequences. Test-only component (sink side effect, not a query). */
  def packedTrainingExport(s: SparkSession, dir: String, path: String): Unit =
    graft.Sinks.trainingExport(packIdsRaw(s, dir), path)

  /** Document-boundary sidecar of [[packRows]] — the attention-mask /
    * loss-mask metadata a trainer needs beside the packed payload: one
    * row per (sequence, contributing doc fragment) with the fragment's
    * sequence-relative start offset and token count. Derived from the
    * SAME [[fragments]] stage [[packRows]] aggregates (one code path —
    * the two views cannot drift), same whitespace-token contract.
    * Oracle-exact against DuckDB's sequential global-numbering
    * definition; within a sequence, offsets tile [0, seq length)
    * gaplessly (spec).
    *
    * Scale shape: the two-phase prefix sum + one explode, NO shuffle at
    * all after the prefix (fragment rows are emitted where the doc
    * lives); output ∝ tokens/L + docs. */
  def seqBounds(s: SparkSession, dir: String): DataFrame = {
    val L = CorpusOps.packSeqLen(s)
    val t = Tables
      .documents(s, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
    fragments(CorpusOps.exclusivePrefix(s, t, "doc_id", "n_tokens"), L, Nil, "toks")
      .select(
        col("seq_id"),
        col("doc_id"),
        (col("g_off") - col("seq_id") * L).as("start_off"),
        size(col("frag")).cast("long").as("n_toks"))
  }

  /** The t/c/f/frag CTE chain — ONE SQL definition of the sequence
    * fragment tiling (2048-token grid over the doc_id-order prefix sum)
    * shared by [[seqBoundsSql]] and [[curriculumSql]] so the two
    * oracles replay the SAME fragments by construction. */
  private[operators] val seqFragCtesSql: String =
    """t AS (
         SELECT doc_id, len(string_split(text, ' ')) AS n
         FROM documents WHERE LENGTH(TRIM(text)) > 0),
       c AS (
         SELECT doc_id, n,
                COALESCE(SUM(n) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ex
         FROM t),
       f AS (SELECT doc_id, ex, n,
                    UNNEST(generate_series(CAST(ex // 2048 AS BIGINT),
                                           CAST((ex + n - 1) // 2048 AS BIGINT))) AS seq_id
             FROM c),
       frag AS (
         SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
                CAST(GREATEST(seq_id * 2048, ex) - seq_id * 2048 AS BIGINT) AS start_off,
                CAST(LEAST((seq_id + 1) * 2048, ex + n) - GREATEST(seq_id * 2048, ex) AS BIGINT)
                  AS n_toks
         FROM f)"""

  val seqBoundsSql: String =
    s"""WITH $seqFragCtesSql
       SELECT seq_id, doc_id, start_off, n_toks
       FROM frag
       ORDER BY seq_id, start_off"""

  /** Deterministic EPOCH SHUFFLE PLAN over the packed sequences — the
    * data-loader side of training: each (epoch, sequence) pair is
    * assigned a shard and a position by a content-free md5 permutation
    * (key = md5('ep<epoch>:<seq_id>')), so every worker can compute its
    * own read order with zero coordination and any run is exactly
    * reproducible. Two epochs × 8 shards here (the shape is the
    * contract; a deployment parameterizes both).
    *
    * Determinism discipline: shard = leading-hex-band CASE (the
    * [[CorpusOps.splitLabel]] move — hex is lexicographic in both
    * engines), position = EXACT rank of the md5 key within
    * (epoch, shard) via [[Scale.globalRank]]'s two-phase ranker — a
    * plain per-shard `row_number` window would put corpus/8 rows
    * through ONE task's sort at 100 TB; the bucketed ranker keeps the
    * sort range-partitioned (bucketOn = the key's leading 15 hex chars
    * as a long, monotone in the full-key order). */
  def epochPlan(s: SparkSession, dir: String): DataFrame = {
    val L = CorpusOps.packSeqLen(s)
    // The sequence-id set is [0, ceil(total_tokens/L)) by [[packRows]]'
    // contiguous-tiling contract (spec-pinned), so the plan derives it
    // from ONE token-count aggregate + a range() — replacing the full
    // packRows lineage this used to drag in (two eager prefix-sum jobs,
    // a fragment explode and a sequence shuffle, all to read off ids the
    // arithmetic already determines). Floor discipline: an epoch plan is
    // consulted every training run; its cost should be |seqs|, not a
    // corpus repack. The spec still pins plan∘packRows agreement.
    val total = Tables
      .documents(s, dir)
      .filter(length(trim(col("text"))) > 0)
      .agg(coalesce(sum(size(split(col("text"), " ")).cast("long")), lit(0L)))
      .head()
      .getLong(0)
    val seqs = s.range((total + L - 1) / L).select(col("id").as("seq_id"))
    val h = md5(concat(lit("ep"), col("epoch").cast("string"), lit(":"),
      col("seq_id").cast("string")))
    val shard = (0 until 7).foldLeft(when(lit(false), lit(-1))) { (acc, i) =>
      acc.when(col("h") < lit(java.lang.Integer.toHexString(2 * i + 2)), lit(i))
    }.otherwise(lit(7))
    val keyed = seqs
      .select(col("seq_id"), explode(sequence(lit(0), lit(1))).as("epoch"))
      .withColumn("h", h)
      .withColumn("shard", shard)
      .withColumn("hnum", expr("CAST(conv(substring(h, 1, 15), 16, 10) AS BIGINT)"))
    // bounds are a LITERAL frame: hnum is a 15-hex-char md5 prefix whose
    // range is statically [0, 16^15) — deriving bounds from `keyed` would
    // re-execute the whole packRows lineage a second time just to learn
    // a range we already know (the ntileQuartiles boundsOf lesson)
    import s.implicits._
    val hnumBounds = Seq(0L, (1L << 60) - 1).toDF("hnum")
    Scale
      .globalRank(keyed, Seq("epoch", "shard"), col("hnum"), Seq(col("h"), col("seq_id")),
        boundsOf = Some(hnumBounds))
      .select(
        col("epoch").cast("long").as("epoch"),
        col("shard").cast("long").as("shard"),
        col("__rn").as("position"),
        col("seq_id"))
  }

  val epochPlanSql: String =
    """WITH t AS (
         SELECT len(string_split(text, ' ')) AS n
         FROM documents WHERE LENGTH(TRIM(text)) > 0),
       tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM t),
       seqs AS (SELECT UNNEST(range(0, (total + 2047) // 2048)) AS seq_id FROM tot),
       e AS (SELECT seq_id, UNNEST(range(0, 2)) AS epoch FROM seqs),
       k AS (SELECT epoch, seq_id,
                    md5('ep' || epoch || ':' || seq_id) AS h
             FROM e),
       sh AS (SELECT epoch, seq_id, h,
                     CASE WHEN h < '2' THEN 0 WHEN h < '4' THEN 1 WHEN h < '6' THEN 2
                          WHEN h < '8' THEN 3 WHEN h < 'a' THEN 4 WHEN h < 'c' THEN 5
                          WHEN h < 'e' THEN 6 ELSE 7 END AS shard
              FROM k)
       SELECT CAST(epoch AS BIGINT) AS epoch, CAST(shard AS BIGINT) AS shard,
              ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY h, seq_id) AS position,
              seq_id
       FROM sh
       ORDER BY epoch, shard, position"""

  /** Exact DuckDB replay of [[tokenizeIds]] over [[TextAnalysis
    * .bpeOracleCtes]]' unrolled FIT + [[TextAnalysis.bpeApplyCtes]]'
    * APPLY chain — the fingerprint compares the full id stream, so the
    * driver hash checks the BPE apply end to end (no more rows-only by
    * necessity: the greedy fold has an exact string rendering, see the
    * FIT oracle's scaladoc). NULL/empty docs surface as zero-id rows
    * with md5('') — the operator's contract. */
  val tokenizeIdsSql: String =
    "WITH " + TextAnalysis.bpeOracleCtes + ",\n" + TextAnalysis.bpeApplyCtes + "\n" +
      """SELECT d.doc_id, COALESCE(t.n_ids, 0) AS n_ids, COALESCE(t.n_merged, 0) AS n_merged,
       COALESCE(t.ids_md5, md5('')) AS ids_md5
FROM documents d LEFT JOIN tok t USING (doc_id)
ORDER BY doc_id"""

  /** Exact DuckDB replay of [[packIds]]: the tokenized id stream, the
    * content-hash split stamp ([[CorpusOps.splitLabel]]'s hex bands),
    * the per-split exclusive prefix and the L=2048 tiling — the packed
    * trainable artifact hash-checked per sequence. */
  val packIdsSql: String =
    "WITH " + TextAnalysis.bpeOracleCtes + ",\n" + TextAnalysis.bpeApplyCtes + ",\n" +
      """sp AS (SELECT doc_id,
              CASE WHEN substr(md5(text), 1, 3) < 'ccd' THEN 'train'
                   WHEN substr(md5(text), 1, 3) < 'e66' THEN 'val'
                   ELSE 'test' END AS split
       FROM documents),
c AS (SELECT t.doc_id, sp.split, t.n_ids,
             COALESCE(SUM(t.n_ids) OVER (PARTITION BY sp.split ORDER BY t.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ex
      FROM tok t JOIN sp USING (doc_id) WHERE t.n_ids > 0),
g AS (SELECT c.split, c.doc_id,
             c.ex + ROW_NUMBER() OVER (PARTITION BY c.doc_id ORDER BY i.wpos, i.ipos) - 1 AS gpos,
             i.id
      FROM idstream i JOIN c ON i.doc_id = c.doc_id)
SELECT split, CAST(gpos // 2048 AS BIGINT) AS seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_ids,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       MIN(doc_id) AS first_doc_id, MAX(doc_id) AS last_doc_id,
       md5(string_agg(id::VARCHAR, ',' ORDER BY gpos)) AS ids_md5
FROM g GROUP BY 1, 2
ORDER BY split, seq_id"""

  /** Curriculum plan over the packed sequences — the ORDERING sibling of
    * [[epochPlan]] (that one shuffles uniformly; this one answers "feed
    * easy data first"): each sequence gets the TOKEN-WEIGHTED mean
    * quality of its contributing documents (the [[seqBounds]] fragment
    * stage joined to text_quality's score — one fragment definition,
    * the views cannot drift) and an exact NTILE(3) curriculum phase
    * over (mean quality, seq_id): phase 1 = the lowest-quality third …
    * phase 3 = the highest (a trainer feeds 3→1 for easy-first, 1→3
    * for hard-first mining; the plan is the deterministic artifact
    * either way).
    *
    * Exactness: per-doc scores quantized to FLOOR(score·10⁶) micro
    * units (both engines derive the identical double first — the
    * already-oracled quality expression — so the floor is identical),
    * weighted mean = Σ(frag_tokens·q_u) DIV Σ frag_tokens in pure
    * integers, and the phase is [[Scale.globalRank]]'s two-phase exact
    * rank pushed through the NTILE remainder arithmetic (win_ntile's
    * move) — never a corpus-wide single-task window; DuckDB replays it
    * as literal NTILE(3).
    *
    * Scale shape: seqBounds' prefix-sum + explode (no post-prefix
    * shuffle), one (seq_id) aggregation, the bucketed ranker's bounded
    * windows; output ∝ sequences (presentation order at dump time). */
  def curriculum(s: SparkSession, dir: String): DataFrame = {
    val q = graft.operators.TextAnalysis
      .quality(s, dir)
      .select(col("doc_id"), floor(col("quality_score") * 1000000).cast("long").as("q_u"))
    val scored = seqBounds(s, dir)
      .join(q, "doc_id")
      .groupBy("seq_id")
      .agg(
        sum(col("n_toks")).as("n_toks"),
        sum(col("n_toks") * col("q_u")).as("num"))
      .select(col("seq_id"), col("n_toks"), expr("num DIV n_toks").as("mean_q_u"))
    // bounds are STATIC — q_u ∈ [0, 10⁶] by the score's [0,1] range —
    // so a 2-row literal frame replaces globalRank's lazy min/max
    // subquery, which would re-execute the whole scored lineage
    // (prefix sum + explode + quality join) a second time (epochPlan's
    // hnumBounds lesson, the ntileQuartiles boundsOf move)
    import s.implicits._
    val bounds = Seq(0L, 1000000L).toDF("mean_q_u")
    graft.operators.Scale
      .globalRank(
        scored,
        Seq.empty,
        col("mean_q_u"),
        Seq(col("mean_q_u"), col("seq_id")),
        boundsOf = Some(bounds))
      .withColumn("phase", expr(graft.operators.Scale.ntileExpr(3)).cast("int"))
      .select(col("seq_id"), col("n_toks"), col("mean_q_u"), col("phase"))
  }

  val curriculumSql: String =
    s"""WITH $seqFragCtesSql,
       ${graft.operators.TextAnalysis.qualityCtesSql},
       q AS (
         SELECT d.doc_id,
                CAST(FLOOR(${graft.operators.TextAnalysis.qualityScoreSql}
                      * 1000000) AS BIGINT) AS q_u
         FROM d JOIN div USING (doc_id)),
       sc AS (
         SELECT seq_id, CAST(SUM(n_toks) AS BIGINT) AS n_toks,
                CAST(SUM(n_toks * q_u) AS BIGINT) AS num
         FROM frag JOIN q USING (doc_id)
         GROUP BY seq_id),
       m AS (SELECT seq_id, n_toks,
                    CAST(num // n_toks AS BIGINT) AS mean_q_u FROM sc)
       SELECT seq_id, n_toks, mean_q_u,
              CAST(NTILE(3) OVER (ORDER BY mean_q_u, seq_id) AS INT) AS phase
       FROM m
       ORDER BY seq_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "train_seq_bounds" -> (seqBounds _),
    "train_epoch_plan" -> (epochPlan _),
    "train_curriculum" -> (curriculum _),
    "text_tokenize_ids" -> (tokenizeIds _),
    "corpus_pack_rows" -> (packRows _),
    "train_pack_ids" -> (packIds _))

  val oracles: Map[String, String] = Map(
    "train_seq_bounds" -> seqBoundsSql,
    "train_epoch_plan" -> epochPlanSql,
    "train_curriculum" -> curriculumSql,
    "corpus_pack_rows" -> packRowsSql,
    "text_tokenize_ids" -> tokenizeIdsSql,
    "train_pack_ids" -> packIdsSql)
}
