package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    Relational.q1Agg(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Windows.queries ++ Sampling.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++
      Multimodal.queries ++ Analytics.queries ++ CorpusOps.queries ++
      CorpusProfile.queries ++ TextIndex.queries ++ Graph.queries ++
      Training.queries ++ RelationalDeep.queries ++ VectorIndex.queries

  /** PRESENTATION row order for corpus-proportional query outputs,
    * applied by [[Verify]] at dump time only. These operators used to end
    * with a global `orderBy` over output ∝ input — at 100 TB that sort
    * (a range-partition exchange + full sort) would be each query's
    * single most expensive stage while changing NOTHING the driver's
    * sorted-hash compare observes. The operator fns now return unsorted
    * results (what Bench times and a library user composes); the dump
    * reapplies the exact former order spec so the driver artifact is
    * byte-identical to previous rounds. Bounded outputs (≤ |groups| rows)
    * keep their inline orderBy — sorting dozens of rows is free and the
    * result reads better. Top-k queries keep theirs too (sort-then-limit
    * is semantics, not presentation). */
  def presentationOrder: Map[String, Seq[Column]] = Map(
    // per-event / per-user / per-session event analytics
    "asof_join" -> Seq(col("event_id")),
    "win_anomaly" -> Seq(col("event_id")),
    "win_attribution" -> Seq(col("event_id")),
    "win_cumsum" -> Seq(col("event_id")),
    "win_ema" -> Seq(col("user_id"), col("ts_us"), col("event_id")),
    "win_moving_avg" -> Seq(col("event_id")),
    "win_range_frame" -> Seq(col("event_id")),
    "win_rolling_median" -> Seq(col("user_id"), col("ts_us"), col("event_id")),
    "win_sessionize" -> Seq(col("event_id")),
    "win_session_stats" -> Seq(col("user_id")),
    "win_streak" -> Seq(col("user_id")),
    "ts_gapfill" -> Seq(col("user_id"), col("day_us")),
    "ts_interpolate" -> Seq(col("user_id"), col("day_us")),
    "ts_twap" -> Seq(col("user_id")),
    "ts_trend" -> Seq(col("user_id")),
    "ts_changepoint" -> Seq(col("user_id")),
    "win_cohort_ltv" -> Seq(col("cohort_month"), col("age_months")),
    "ts_autocorr" -> Seq(col("user_id")),
    "win_rfm" -> Seq(col("custkey")),
    "ts_features" -> Seq(col("user_id"), col("dayno")),
    "ts_ohlc" -> Seq(col("day_us"), col("event_type")),
    "ts_active_users" -> Seq(col("dayno")),
    "win_hourly" -> Seq(col("hour_us"), col("event_type")),
    "range_join" -> Seq(col("user_id")),
    // per-document text analysis
    "text_compress_ratio" -> Seq(col("doc_id")),
    "text_entropy" -> Seq(col("doc_id")),
    "text_fingerprint" -> Seq(col("doc_id")),
    "text_langid" -> Seq(col("doc_id")),
    "text_lm_bigram" -> Seq(col("doc_id")),
    "text_lm_score" -> Seq(col("doc_id")),
    "text_pii" -> Seq(col("doc_id")),
    "text_quality" -> Seq(col("doc_id")),
    "text_quality_train" -> Seq(col("bucket")),
    "text_quality_model" -> Seq(col("doc_id")),
    "text_dsir" -> Seq(col("doc_id")),
    "text_repetition" -> Seq(col("doc_id")),
    "text_novelty" -> Seq(col("doc_id")),
    "emb_pca_top" -> Seq(col("dim_idx")),
    "emb_project2d" -> Seq(col("vec_id")),
    "text_scrub" -> Seq(col("doc_id")),
    "text_chunk" -> Seq(col("doc_id"), col("off")),
    "dedup_semantic" -> Seq(col("vec_id")),
    "text_span_dup" -> Seq(col("doc_id")),
    "text_span_dup_s4" -> Seq(col("doc_id")),
    "text_span_excise" -> Seq(col("doc_id")),
    "text_stats" -> Seq(col("doc_id")),
    "text_tfidf" -> Seq(col("doc_id"), col("rank")),
    "text_tokens_bpe" -> Seq(col("doc_id")),
    "text_tokens_unigram" -> Seq(col("doc_id")),
    "text_winnow" -> Seq(col("doc_id")),
    // corpus lifecycle
    "corpus_curate" -> Seq(col("doc_id")),
    "corpus_mix" -> Seq(col("doc_id")),
    "corpus_pack" -> Seq(col("doc_id")),
    "corpus_shard" -> Seq(col("doc_id")),
    "data_split" -> Seq(col("doc_id")),
    "text_boilerplate" -> Seq(col("doc_id")),
    "corpus_pack_rows" -> Seq(col("seq_id")),
    "emb_pq" -> Seq(col("vec_id")),
    "train_seq_bounds" -> Seq(col("seq_id"), col("start_off")),
    "train_curriculum" -> Seq(col("seq_id")),
    "train_epoch_plan" -> Seq(col("epoch"), col("shard"), col("position")),
    // dedup (full pair/verdict frames; top-k dedup queries keep their
    // inline sort-then-limit)
    "corpus_dedup" -> Seq(col("doc_id")),
    "corpus_dedup_ng" -> Seq(col("doc_id")),
    "dedup_exact" -> Seq(col("keeper_doc_id")),
    "dedup_exact_norm" -> Seq(col("keeper_doc_id")),
    "dedup_minhash" -> Seq(col("est_jaccard").desc, col("doc_a"), col("doc_b")),
    "dedup_simhash" -> Seq(col("hamming"), col("doc_a"), col("doc_b")),
    "dedup_survivorship" -> Seq(col("doc_id"), col("reason")),
    "text_edit_sim" -> Seq(col("jaccard").desc, col("doc_a"), col("doc_b")),
    // similarity / graph / multimodal per-item outputs
    "emb_quantize" -> Seq(col("vec_id")),
    "graph_pagerank" -> Seq(col("score_micro").desc, col("doc_id")),
    "graph_triangles" -> Seq(col("doc_id")),
    "mm_features" -> Seq(col("doc_id")),
    "mm_resize" -> Seq(col("doc_id")),
    "mm_frame_sample" -> Seq(col("doc_id"), col("frame_idx")),
    // fact-scaled relational outputs
    "join_semi" -> Seq(col("c_custkey")),
    "join_anti" -> Seq(col("c_custkey")),
    "agg_pivot" -> Seq(col("user_id")),
    "set_ops" -> Seq(col("custkey")),
    "string_funcs" -> Seq(col("p_partkey")))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Windows.oracles ++ Sampling.oracles ++
      TextAnalysis.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      Multimodal.oracles ++ Analytics.oracles ++ CorpusOps.oracles ++
      CorpusProfile.oracles ++ TextIndex.oracles ++ Graph.oracles ++
      Training.oracles ++ RelationalDeep.oracles ++ VectorIndex.oracles
}
