package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling operators — the reference samples every query result to ~500
  * rows, randomly (`df.sample(n=500, random_state=42)`) or stratified per
  * group (main.py:256-262), before exporting to its small-table store.
  *
  * Seeded-RNG sampling is not reproducible across engines, so both samplers
  * here are *deterministic*: a multiplicative hash scramble
  * (`(key * 40503) % 65536`, a Knuth-style Fibonacci multiplier kept within
  * exact integer range of both engines) stands in for the RNG. Same rows
  * every run, every engine, any partitioning.
  *
  * Scale: [[deterministic]] is a pure filter — it pushes down to the scan,
  * shuffles nothing, and samples 100 TB as cheaply as a WHERE clause.
  * [[stratified]] shuffles once on the stratum key; per-stratum state is a
  * bounded top-N. Neither does `ORDER BY rand()` (a global sort at scale).
  */
object Sampling {

  /** ~5% deterministic sample of events (scramble < 3277/65536). */
  def deterministic(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .filter((col("event_id") * 40503L) % 65536L < 3277L)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")

  val deterministicSql: String =
    """SELECT event_id, user_id, event_type, value
       FROM events
       WHERE (event_id * 40503) % 65536 < 3277
       ORDER BY event_id"""

  /** Seeded Bernoulli sample — the thin wrapper over native `df.sample`
    * that mirrors the reference's `random_state=42` call (main.py:256-258).
    * Deterministic for a FIXED seed, partitioning and row order (Spark
    * seeds its per-partition RNG from seed + partition index), but NOT
    * reproducible across engines or repartitionings — which is why the
    * oracle-checked samplers above use the hash scramble instead. Use this
    * one when statistical (uncorrelated-with-key) sampling matters more
    * than cross-engine replay. */
  def seeded(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Stratified sample: at most 100 events per event_type, chosen by the
    * scrambled order (pseudo-random but engine-independent).
    *
    * Scale shape: a window partitioned by event_type alone (~5 values)
    * would sort ~1/5 of the table per task. Partial-top-k instead: top-100
    * per (physical partition, type) — one shuffle spread over pids×types
    * balanced groups — then a merge over the surviving ≤ 100×pids×types
    * rows. The global top-100 is contained in the union of per-partition
    * top-100s for any partitioning. */
  def stratified(s: SparkSession, dir: String): DataFrame = {
    val scramble = (col("event_id") * 40503L) % 65536L
    val wLocal = Window
      .partitionBy("__pid", "event_type")
      .orderBy(scramble.asc, col("event_id"))
    val partial = Tables
      .events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("rk", row_number().over(wLocal))
      .filter(col("rk") <= 100)
      .drop("__pid", "rk")
    val w = Window
      .partitionBy("event_type")
      .orderBy(scramble.asc, col("event_id"))
    partial
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 100)
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  val stratifiedSql: String =
    """WITH ranked AS (
         SELECT event_id, user_id, event_type, value,
                ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY (event_id * 40503) % 65536, event_id) AS rk
         FROM events)
       SELECT event_id, user_id, event_type, value
       FROM ranked WHERE rk <= 100
       ORDER BY event_id"""

  /** Weighted deterministic sample of documents: keep probability scales
    * with document length (`w = min(1, n_chars/500)` — a stand-in for any
    * quality score), decided by comparing the scrambled key against the
    * weight in EXACT integer space (`scramble < floor(w * 65536)`), so
    * both engines keep identical rows. Like [[deterministic]] this is a
    * pure pushdown-able filter — weighted corpus downsampling at 100 TB
    * costs one scan, no shuffle, no RNG. */
  def weighted(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .filter(
        (col("doc_id") * 40503L) % 65536L <
          floor(least(lit(1.0), col("n_chars") / 500.0) * 65536.0).cast("long"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")

  val weightedSql: String =
    """SELECT doc_id, lang, n_chars
       FROM documents
       WHERE (doc_id * 40503) % 65536 <
             CAST(FLOOR(LEAST(1.0, n_chars / 500.0) * 65536.0) AS BIGINT)
       ORDER BY doc_id"""

  /** EXACT-k deterministic global sample — the reference's
    * `df.sample(n=500, random_state=42)` contract (exactly n rows, same
    * rows every run — main.py:256) made cross-engine-reproducible: rank
    * every row by `md5(event_id)` (a portable pseudo-random total order;
    * the (hash, id) tie-break makes it total even under collisions) and
    * keep the first 500. The fraction samplers can't promise an exact
    * count; this can't push down as a filter — the two are complements,
    * and this one costs a TakeOrdered: a 500-row heap per partition,
    * then one bounded merge — never a global sort, never a shuffle of
    * the data (plan-pinned).
    *
    * Merge fan-in bound: a bare TakeOrdered merges k rows PER SCAN
    * PARTITION at the single merge point — 500·10⁶ rows at a 100 TB
    * partition count. The `coalesce(fanIn)` (shuffle-free, a no-op when
    * the scan already has ≤ fanIn partitions) re-heaps each group of
    * scan partitions inside one task first, so the merge point sees at
    * most 500 × `spark.graft.sample.exactKFanIn` (default 1024) rows at
    * ANY corpus size — the two-level top-k tree, built by partition
    * coalescing. Scan parallelism caps at fanIn for this one
    * scan-dominated sampler; raise the knob if that ever binds. */
  def exactK(s: SparkSession, dir: String): DataFrame = {
    val fanIn = s.conf.get("spark.graft.sample.exactKFanIn", "1024").toInt
    require(fanIn > 0, s"exactKFanIn must be positive, got $fanIn")
    Tables
      .events(s, dir)
      .filter(col("event_id").isNotNull)
      .select(
        col("event_id"),
        col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_type"),
        col("value"),
        md5(col("event_id").cast("string")).as("__key"))
      .coalesce(fanIn)
      .orderBy(col("__key"), col("event_id"))
      .limit(500)
      .drop("__key")
      .orderBy("event_id")
  }

  val exactKSql: String =
    """WITH s AS (
         SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
         FROM events
         WHERE event_id IS NOT NULL
         ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
         LIMIT 500)
       SELECT event_id, user_id, ts_us, event_type, value
       FROM s
       ORDER BY event_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_exact_k" -> (exactK _),
    "sample_det" -> (deterministic _),
    "sample_weighted" -> (weighted _),
    "sample_stratified" -> (stratified _))

  val oracles: Map[String, String] = Map(
    "sample_exact_k" -> exactKSql,
    "sample_det" -> deterministicSql,
    "sample_weighted" -> weightedSql,
    "sample_stratified" -> stratifiedSql)
}
