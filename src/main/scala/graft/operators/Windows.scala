package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / event-time analytics over the `events` table.
  *
  * Extends the reference's window usage (RANK/FIRST_VALUE, main.py:104-105)
  * to the full set a production event pipeline needs: tumbling windows,
  * moving aggregates, sessionization, per-group top-k, running totals.
  *
  * Numeric discipline: `value` is an arbitrary random double, and summing
  * raw doubles is partition-order-dependent. Every aggregate here works on
  * integer cents (`FLOOR(value*100)` — one deterministic IEEE multiply +
  * floor), sums exactly in long space, and divides once at the end. The
  * DuckDB oracle does the identical arithmetic.
  *
  * Timestamps are emitted as `unix_micros` bigints (`*_us`) so the oracle
  * comparison never depends on either engine's timestamp rendering.
  *
  * Scale: every window below is partitioned by `user_id`/`event_type` —
  * state is bounded per key and Spark distributes keys across executors.
  * There is no unpartitioned ORDER BY over raw events anywhere.
  */
object Windows {

  private def cents(c: String): org.apache.spark.sql.Column =
    floor(col(c) * 100.0).cast("long")

  /** SQL fragment: exact HALF-AWAY-FROM-ZERO rounding of p/q (q > 0) to
    * 1/scale units, as pure integer arithmetic. ROUND(double) is
    * representation-sensitive when the true quotient sits exactly on a
    * rounding boundary (Java rounds the shortest decimal rendering,
    * DuckDB the binary value — observed to flip the 4th decimal on real
    * sf0.1 data); this never is: both engines derive the SAME integer
    * and the one float op is the final division by the scale literal.
    *
    * The naive form ((2·|p|·scale + q) DIV (2·q)) would need the
    * intermediate 2·|p|·scale exact — at the operators' documented
    * envelopes |p| can reach ~10³⁵ (ts_trend's fc_num at 10⁹ events/
    * user), overflowing DECIMAL(38,0)/HUGEINT. So the quotient is SPLIT
    * with |p| = a·q + r (a = |p| DIV q, r = |p| % q):
    *   round(|p|/q · scale) = a·scale + (2·r·scale + q) DIV (2·q)
    * — an exact identity, and the largest intermediate is now
    * 2·q·scale (< 10³⁸ whenever q < 5·10³¹), independent of |p|. Every
    * DIV/% runs on non-negative operands only, so Spark-truncate and
    * DuckDB-floor agree (the sign is re-applied outside); a·scale is
    * re-widened to DECIMAL(38,0) (Spark's DIV yields LONG). */
  private[operators] def exactRoundSql(p: String, q: String, scale: Long): String = {
    val ap = s"ABS(CAST(($p) AS DECIMAL(38,0)))"
    s"CAST(SIGN($p) AS DOUBLE) * CAST(" +
      s"CAST($ap DIV ($q) AS DECIMAL(38,0)) * $scale" +
      s" + (2 * ($ap % ($q)) * $scale + ($q)) DIV (2 * ($q))" +
      s" AS DOUBLE) / $scale.0D"
  }

  /** Tumbling hourly aggregate: the batch shape of a streaming windowed agg
    * (see [[graft.streaming.EventStreams]]). One shuffle on (hour, type);
    * partial aggregation makes the shuffle ~|groups| not |rows|. */
  def hourly(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .groupBy(
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        col("event_type"))
      .agg(
        count(lit(1)).as("num_events"),
        (sum(cents("value")) / 100.0).as("total_value"))

  val hourlySql: String =
    """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
              COUNT(*) AS num_events,
              SUM(CAST(FLOOR(value * 100) AS BIGINT)) / 100.0 AS total_value
       FROM events
       GROUP BY 1, 2
       ORDER BY hour_us, event_type"""

  /** Per-user moving average over the trailing 4 events (ROWS BETWEEN 3
    * PRECEDING AND CURRENT ROW), deterministic tie-break on event_id. */
  def movingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    Tables
      .events(s, dir)
      .select(
        col("event_id"),
        col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(sum(cents("value")).over(w) / (count(lit(1)).over(w) * 100.0), 4)
          .as("moving_avg"))
  }

  val movingAvgSql: String =
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
              ROUND(SUM(CAST(FLOOR(value * 100) AS BIGINT))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                    / (COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) * 100.0),
                    4) AS moving_avg
       FROM events
       ORDER BY event_id"""

  /** Sessionization: a new session starts after a >30 min gap per user;
    * session_id = running count of session starts. The canonical
    * lag-gap + cumulative-sum pattern — two windows over the same
    * (user_id, ts) partitioning, one shuffle total. */
  /** Longest consecutive-day activity streak per user — the canonical
    * gaps-and-islands idiom [[sessionize]]'s time-gap variant doesn't
    * cover: distinct active days, then `dayno − row_number()` is constant
    * exactly within a consecutive run, so one groupBy on that constant
    * measures every streak. All-integer (epoch day numbers), best streak
    * picked by an ordered struct max (longest, then earliest start) so
    * the tie-break is deterministic in both engines.
    *
    * Scale shape: every window is user-partitioned and the per-user day
    * list is calendar-bounded; two shrinking groupBys — no global sort,
    * no unpartitioned window, same distribution end to end. */
  def streaks(s: SparkSession, dir: String): DataFrame = {
    val days = Tables
      .events(s, dir)
      .select(
        col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).cast("long").as("dayno"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("dayno")
    val runs = days
      .withColumn("grp", col("dayno") - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"), min(col("dayno")).as("start"))
    runs
      .groupBy("user_id")
      .agg(max(struct(col("len"), (-col("start")).as("neg_start"))).as("m"))
      .select(
        col("user_id"),
        col("m.len").as("best_streak"),
        (-col("m.neg_start")).as("start_day"))
  }

  val streaksSql: String =
    """WITH days AS (
         SELECT DISTINCT user_id,
                CAST(DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS dayno
         FROM events),
       runs AS (
         SELECT user_id, COUNT(*) AS len, MIN(dayno) AS start
         FROM (SELECT user_id, dayno,
                      dayno - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dayno) AS grp
               FROM days)
         GROUP BY user_id, grp),
       best AS (
         SELECT user_id, len, start,
                ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY len DESC, start) AS rk
         FROM runs)
       SELECT user_id, len AS best_streak, start AS start_day
       FROM best WHERE rk = 1
       ORDER BY user_id"""

  /** The session-assignment CTEs shared by [[sessionizeSql]] and
    * [[sessionStatsSql]] — one copy of the 30-min gap constant, the
    * strict `>` comparison and the (ts_us, event_id) tie-break, so the
    * two oracles can never desynchronize (the oracle-side twin of the
    * Scala composition: [[sessionStats]] calls [[sessionize]]).
    * Declared ABOVE both consuming vals — object-init order makes a
    * later-declared constant interpolate as null. */
  private val sessionCte: String =
    """g AS (
         SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                     > 1800000000 THEN 1 ELSE 0 END AS new_session
         FROM events),
       sess AS (
         SELECT event_id, user_id, ts_us,
                CAST(SUM(new_session) OVER
                  (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS session_id
         FROM g)"""

  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables
      .events(s, dir)
      .select(
        col("event_id"),
        col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn(
        "new_session",
        when(
          col("ts_us") - lag(col("ts_us"), 1).over(
            Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))) >
            lit(1800000000L),
          1L).otherwise(lit(0L)))
      .withColumn(
        "session_id",
        sum(col("new_session")).over(
          Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))))
      .select("event_id", "user_id", "ts_us", "session_id")
  }

  /** First/last-touch attribution per purchase — the marketing-analytics
    * composition of [[sessionize]]: for every purchase event, which
    * event type OPENED its session (first touch) and which immediately
    * preceded the purchase (last touch; NULL when the purchase opened
    * the session itself). Shares the session assignment with
    * [[sessionize]]/[[sessionStats]] by CALLING it (the Scala
    * composition discipline; the oracle interpolates the shared session
    * CTE), then two windows over the (user, session) partition — the
    * same user-keyed distribution, one more narrow join to recover
    * event_type (sessionize's output contract is type-free).
    *
    * Scale shape: windows partitioned by (user, session) — strictly
    * finer than sessionize's own user partitioning, so state per task is
    * bounded by a single session's length (a pathological never-idle
    * user degrades to one user-sized partition, the same documented
    * bound as sessionize itself); one AQE-sized equi-join on event_id,
    * output ∝ purchase events. */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    val types = Tables.events(s, dir).select(col("event_id"), col("event_type"))
    val w = Window
      .partitionBy("user_id", "session_id")
      .orderBy(col("ts_us"), col("event_id"))
    sessionize(s, dir)
      .join(types, "event_id")
      .withColumn(
        "first_touch",
        first(col("event_type")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("last_touch", lag(col("event_type"), 1).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"),
        col("user_id"),
        col("session_id"),
        col("first_touch"),
        col("last_touch"))
  }

  val attributionSql: String =
    s"""WITH $sessionCte,
       t AS (
         SELECT sess.event_id, sess.user_id, sess.ts_us, sess.session_id, e.event_type
         FROM sess JOIN events e USING (event_id)),
       att AS (
         SELECT event_id, user_id, session_id, event_type,
                first_value(event_type) OVER (
                  PARTITION BY user_id, session_id ORDER BY ts_us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_touch,
                lag(event_type, 1) OVER (
                  PARTITION BY user_id, session_id ORDER BY ts_us, event_id) AS last_touch
         FROM t)
       SELECT event_id, user_id, session_id, first_touch, last_touch
       FROM att
       WHERE event_type = 'purchase'
       ORDER BY event_id"""

  /** Per-user session rollup — the composition payoff of [[sessionize]]:
    * sessions → (events, span) per session → per-user counts and means.
    * Means are exact-integer ratios (event counts and µs spans summed as
    * longs, ONE double division at the end) so both engines agree to the
    * bit before the 4-dp round.
    *
    * Scale shape: the session assignment is user-partitioned windows
    * (sessionize's own shape), then two groupBys that only ever shrink —
    * (user, session) then user — each with map-side partial aggregation
    * on the same user-keyed distribution; nothing global, no
    * unpartitioned sort. */
  def sessionStats(s: SparkSession, dir: String): DataFrame = {
    val sess = sessionize(s, dir) // final orderBy collapses under the agg
    val perSession = sess
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_ev"),
        (max(col("ts_us")) - min(col("ts_us"))).as("span_us"))
    perSession
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_ev")).as("n_events"),
        round(sum(col("n_ev")).cast("double") / count(lit(1)), 4)
          .as("avg_session_events"),
        round(
          sum(col("span_us")).cast("double") / count(lit(1)) /
            lit(1000000).cast("double"),
          4).as("avg_session_secs"))
  }

  val sessionStatsSql: String =
    s"""WITH $sessionCte,
       per_session AS (
         SELECT user_id, session_id, COUNT(*) AS n_ev,
                MAX(ts_us) - MIN(ts_us) AS span_us
         FROM sess GROUP BY user_id, session_id)
       SELECT user_id, COUNT(*) AS n_sessions,
              CAST(SUM(n_ev) AS BIGINT) AS n_events,
              ROUND(CAST(SUM(n_ev) AS DOUBLE) / COUNT(*), 4) AS avg_session_events,
              ROUND(CAST(SUM(span_us) AS DOUBLE) / COUNT(*)
                    / CAST(1000000 AS DOUBLE), 4) AS avg_session_secs
       FROM per_session GROUP BY user_id
       ORDER BY user_id"""

  val sessionizeSql: String =
    s"""WITH $sessionCte
       SELECT event_id, user_id, ts_us, session_id
       FROM sess
       ORDER BY event_id"""

  /** Top-3 events per type by value (row_number, deterministic tie-break).
    *
    * Scale shape: event_type has ~5 values, so a window partitioned by it
    * alone would sort ~1/5 of the fact table on a single task. Instead the
    * classic partial-top-k-then-merge: phase 1 takes the top-3 per
    * (physical input partition, type) — the window keys on
    * (`spark_partition_id()`, event_type), so the one shuffle spreads the
    * same data over pids×types balanced sort groups — and phase 2 merges
    * the surviving ≤ 3×pids×types rows (tiny) into the global top-3 per
    * type. The global top-k is always contained in the union of
    * per-partition top-k's, for any partitioning of the input. */
  def topkPerType(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .events(s, dir)
      .select(col("event_type"), col("event_id"), col("user_id"), col("value"))
    val wLocal = Window
      .partitionBy("__pid", "event_type")
      .orderBy(col("value").desc, col("event_id"))
    val partial = e
      .withColumn("__pid", spark_partition_id())
      .withColumn("rk", row_number().over(wLocal))
      .filter(col("rk") <= 3)
      .drop("__pid", "rk")
    val w = Window.partitionBy("event_type").orderBy(col("value").desc, col("event_id"))
    partial
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy("event_type", "rk")
  }

  val topkPerTypeSql: String =
    """WITH ranked AS (
         SELECT event_type, event_id, user_id, value,
                CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY value DESC, event_id) AS INT) AS rk
         FROM events)
       SELECT event_type, event_id, user_id, value, rk
       FROM ranked WHERE rk <= 3
       ORDER BY event_type, rk"""

  /** Running total of value (cents-exact) per user ordered by time. */
  def cumsum(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .events(s, dir)
      .select(
        col("event_id"),
        col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        (sum(cents("value")).over(w) / 100.0).as("running_value"))
  }

  val cumsumSql: String =
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
              SUM(CAST(FLOOR(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
                AS running_value
       FROM events
       ORDER BY event_id"""

  /** As-of join: each event picks the user's latest order with
    * o_orderdate <= ts (DuckDB expresses this natively with ASOF JOIN).
    *
    * Spark has no asof operator; the scalable rendering is the union+window
    * trick: tag order rows and event rows, union them, and per user let each
    * event inherit the most recent order attributes via last_value(ignore
    * nulls) over (user, time). One shuffle on user_id, zero pairwise
    * blow-up — this survives 100 TB where an inequality join would not.
    *
    * Orders are first deduped to one row per (custkey, orderdate) keeping
    * max(o_orderkey), making the as-of match unique and both engines
    * deterministic. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .events(s, dir)
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("t_us"),
        col("event_id"))
    val o = Tables
      .orders(s, dir)
      .groupBy(
        col("o_custkey").as("user_id"),
        // o_orderdate arrives as TIMESTAMP_NTZ; cast is wall-time-preserving
        // under the UTC session and makes unix_micros applicable
        unix_micros(col("o_orderdate").cast("timestamp")).as("t_us"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))

    val tagged = o
      .select(col("user_id"), col("t_us"), lit(null).cast("long").as("event_id"), col("o_orderkey"))
      .unionByName(
        e.select(col("user_id"), col("t_us"), col("event_id"), lit(null).cast("long").as("o_orderkey")))

    // order rows sort before event rows at identical t_us (is_event 0 < 1)
    // so an order dated exactly at the event time is visible to it (>= match)
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("t_us"), col("o_orderkey").isNull.cast("int"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("matched_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("event_id").isNotNull && col("matched_orderkey").isNotNull)
      .select(
        col("event_id"),
        col("user_id"),
        col("t_us").as("ts_us"),
        col("matched_orderkey"))
  }

  val asofJoinSql: String =
    """WITH o AS (
         SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS t_us,
                MAX(o_orderkey) AS o_orderkey
         FROM orders GROUP BY 1, 2),
       e AS (SELECT user_id, epoch_us(ts) AS t_us, event_id FROM events)
       SELECT e.event_id, e.user_id, e.t_us AS ts_us,
              o.o_orderkey AS matched_orderkey
       FROM e ASOF JOIN o
         ON e.user_id = o.user_id AND e.t_us >= o.t_us
       ORDER BY e.event_id"""

  /** Time-based RANGE window frame: per user, the running sum of event
    * values over the trailing 10 minutes — a frame defined by the ORDER-BY
    * VALUE distance (micros), not a row count, so ties and gaps behave
    * correctly. Same per-user partitioning scale story as every window
    * here; integer-cents discipline for the sum. */
  def rangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts_us"))
      .rangeBetween(-600000000L, Window.currentRow)
    Tables
      .events(s, dir)
      .select(
        col("event_id"),
        col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        cents("value").as("v"))
      .withColumn("sum_10min", sum(col("v")).over(w) / 100.0)
      .select("event_id", "user_id", "ts_us", "sum_10min")
  }

  val rangeFrameSql: String =
    """WITH e AS (
         SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                CAST(FLOOR(value * 100) AS BIGINT) AS v
         FROM events)
       SELECT event_id, user_id, ts_us,
              SUM(v) OVER (PARTITION BY user_id ORDER BY ts_us
                           RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) / 100.0
                AS sum_10min
       FROM e
       ORDER BY event_id"""

  /** Banded range join (interval self-join): per user, ordered event pairs
    * (a → b) with `b.ts ∈ [a.ts, a.ts + 5 min]`, aggregated to per-user
    * pair counts. The naive form is a non-equi join — Spark would plan a
    * nested-loop. Instead each left row is duplicated into its 5-minute
    * bucket and the next (`ts DIV W` and `+1`), the right row keeps its own
    * bucket, and the join becomes pure key equality on (user, bucket) with
    * the range predicate demoted to a post-join filter: every qualifying
    * pair matches in exactly one bucket (the right bucket is unique), so no
    * dedup pass. 2× row duplication buys a linear shuffle join at any
    * scale — the standard epsilon-join banding trick. */
  /** Interval-DIMENSION lookup — the other non-equi join shape beside
    * [[rangeJoin]]'s self-join: classify every event against a tiny
    * table of [lo, hi) value tiers (the IP-range → geo, amount → fee
    * bracket, score → grade family). The dimension BROADCASTS and the
    * plan is a BroadcastNestedLoopJoin — for a bounded tier table that
    * is the RIGHT plan (each row tests a handful of ranges in place;
    * nothing shuffles); a dimension past broadcast size switches to
    * [[rangeJoin]]'s band-bucketing, same as any wide interval join.
    * INNER join semantics: an out-of-tier row (NULL/NaN/out-of-envelope
    * value never enters — [[twap]]'s row rule; tiers cover the whole
    * envelope) classifies nowhere and drops. Exact cents against exact
    * integer bounds; per-tier rollup is a ≤\|tiers\|-row shuffle. */
  /** The [lo, hi) value-tier dimension in cents, covering the full
    * ±5·10⁶-dollar metric envelope — shared by [[intervalDim]] and its
    * streaming twin ([[graft.streaming.EventStreams.classifyTiers]]) so
    * both classify identically by construction. */
  private[graft] def tierFrame(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (1, "negative", -500000001L * 100L, 0L),
      (2, "micro", 0L, 10L * 100L),
      (3, "small", 10L * 100L, 100L * 100L),
      (4, "medium", 100L * 100L, 1000L * 100L),
      (5, "large", 1000L * 100L, 500000001L * 100L))
      .toDF("tier_ord", "tier", "lo", "hi")
  }

  def intervalDim(s: SparkSession, dir: String): DataFrame = {
    val tiers = tierFrame(s)
    Tables
      .events(s, dir)
      .filter(
        col("value").isNotNull && !isnan(col("value")) && abs(col("value")) <= 5.0e6)
      .select(cents("value").as("c"))
      .join(broadcast(tiers), col("c") >= col("lo") && col("c") < col("hi"))
      .groupBy("tier_ord", "tier")
      .agg(
        count(lit(1)).as("n_events"),
        (sum(col("c")) / 100.0).as("total_value"))
      .orderBy("tier_ord")
  }

  val intervalDimSql: String =
    """WITH tiers(tier_ord, tier, lo, hi) AS (VALUES
         (1, 'negative', -50000000100, 0),
         (2, 'micro', 0, 1000),
         (3, 'small', 1000, 10000),
         (4, 'medium', 10000, 100000),
         (5, 'large', 100000, 50000000100)),
       e AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) AS c
             FROM events
             WHERE value IS NOT NULL AND NOT isnan(value) AND abs(value) <= 5000000)
       SELECT tier_ord, tier, COUNT(*) AS n_events,
              SUM(c) / 100.0 AS total_value
       FROM e JOIN tiers ON c >= lo AND c < hi
       GROUP BY 1, 2
       ORDER BY tier_ord"""

  /** Semi-structured extraction — the JSON-properties column every event
    * log carries and every engine must be able to open: pull `$.k` out
    * of the `props` JSON string scan-side (codegen'd `get_json_object`
    * — a narrow map, no UDF, no shuffle) and roll it up per event type.
    * Missing key / empty object / NULL props / malformed JSON / a
    * non-integral `$.k` all yield NULL k and are counted (`n_with_k`
    * vs `n_events`) rather than dropped — schema drift in a property
    * bag is data, not an error. "Integral" is pinned by the SAME
    * explicit regex (`^-?[0-9]{1,18}$`) on both engines, because the
    * engines' native loose casts genuinely disagree on the edges:
    * DuckDB `TRY_CAST('3.7' AS BIGINT)` ROUNDS to 4 where Spark
    * `try_cast` folds to NULL, and DuckDB's plain CAST raises on
    * malformed input where Spark folds — with the shared regex gate
    * (≤ 18 digits also keeps both inside BIGINT, no overflow
    * asymmetry), every accepted string casts exactly and identically.
    * NULL event types fold to `(none)`
    * ([[graft.operators.CorpusOps.batchDrift]]'s census convention).
    * Exact integer sum → one 4-dp division for the mean.
    *
    * Scale: extraction rides the scan (projection only reads `props`,
    * `event_type`); the rollup is a ≤\|types\|-row map-combined shuffle;
    * countDistinct is exact per bounded group — at unbounded k
    * cardinality the HLL sketch ([[Analytics.sketches]]) is the swap. */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .select(
        coalesce(col("event_type"), lit("(none)")).as("event_type"),
        expr(
          "CAST(CASE WHEN get_json_object(props, '$.k') RLIKE '^-?[0-9]{1,18}$' " +
            "THEN get_json_object(props, '$.k') END AS long)").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        countDistinct(col("k")).as("n_distinct_k"),
        round(sum(col("k")).cast("double") / count(col("k")).cast("double"), 4).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val jsonExtractSql: String =
    """WITH e AS (
         SELECT COALESCE(event_type, '(none)') AS event_type,
                CASE WHEN json_valid(props)
                      AND regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]{1,18}$')
                     THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                END AS k
         FROM events)
       SELECT event_type, COUNT(*) AS n_events,
              COUNT(k) AS n_with_k,
              COUNT(DISTINCT k) AS n_distinct_k,
              ROUND(CAST(SUM(k) AS DOUBLE) / CAST(COUNT(k) AS DOUBLE), 4) AS avg_k,
              MIN(k) AS min_k,
              MAX(k) AS max_k
       FROM e
       GROUP BY 1
       ORDER BY event_type"""

  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val W = 300000000L // 5 minutes in micros
    val e = Tables
      .events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val a = e
      .select(col("user_id"), col("event_id").as("id_a"), col("ts_us").as("ts_a"))
      .withColumn(
        "bucket",
        explode(array(expr(s"ts_a DIV $W"), expr(s"ts_a DIV $W") + 1)))
    val b = e
      .select(col("user_id").as("user_b"), col("event_id").as("id_b"), col("ts_us").as("ts_b"))
      .withColumn("bucket_b", expr(s"ts_b DIV $W"))
    a.join(
        b,
        col("bucket") === col("bucket_b") && col("user_id") === col("user_b") &&
          col("id_a") =!= col("id_b") &&
          col("ts_b") >= col("ts_a") && col("ts_b") <= col("ts_a") + W)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"), min(col("ts_b") - col("ts_a")).as("min_gap_us"))
  }

  val rangeJoinSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events)
       SELECT a.user_id, COUNT(*) AS n_pairs, MIN(b.ts_us - a.ts_us) AS min_gap_us
       FROM e a JOIN e b ON a.user_id = b.user_id AND a.event_id <> b.event_id
         AND b.ts_us BETWEEN a.ts_us AND a.ts_us + 300000000
       GROUP BY 1
       ORDER BY a.user_id"""

  /** NTILE quartiles: order totals bucketed into 4 equal-frequency tiles
    * per market segment, reported as per-(segment, quartile) stats.
    *
    * Scale shape: `ntile(4) OVER (PARTITION BY mktsegment ...)` would sort
    * ~1/5 of the fact table per task (5 segment values — partitions grow
    * linearly with the table). Instead: exact distributed rank via
    * [[Scale.globalRank]] (deterministic value-bucket split + per-bucket
    * rank + tiny offset merge — every sort bounded by the bucket size),
    * then NTILE's closed form over (rank, group size): with
    * q = n DIV 4 and r = n MOD 4, the first r tiles hold q+1 rows and the
    * rest q — a narrow map, bit-identical to both engines' NTILE including
    * tie-splitting, because the rank order (cents, o_orderkey) is total.
    * Money in integer cents as everywhere. */
  def ntileQuartiles(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    // a NULL price cannot be ranked (globalRank guards loudly); a
    // corrupt priceless order is dropped, crawl-hygiene style — the
    // pathological-relational sweep is what caught the crash, and the
    // oracle mirrors the predicate
    val base = o
      .filter(col("o_totalprice").isNotNull)
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(
        col("c_mktsegment").as("mktsegment"),
        col("o_orderkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    Scale
      .globalRank(
        base,
        Seq("mktsegment"),
        col("cents"),
        Seq(col("cents"), col("o_orderkey")),
        // bounds only need a covering range, not the join: a one-column
        // orders scan instead of a second pass over orders⋈customer
        boundsOf = Some(
          o.filter(col("o_totalprice").isNotNull)
            .select(floor(col("o_totalprice") * 100).cast("long").as("cents"))))
      .withColumn("quartile", expr(Scale.ntileExpr(4)).cast("int"))
      .groupBy("mktsegment", "quartile")
      .agg(
        count(lit(1)).as("n_orders"),
        (min(col("cents")) / 100.0).as("lo_price"),
        (max(col("cents")) / 100.0).as("hi_price"))
      .orderBy("mktsegment", "quartile")
  }

  val ntileQuartilesSql: String =
    """WITH j AS (
         SELECT c_mktsegment AS mktsegment, o_orderkey,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_totalprice IS NOT NULL),
       t AS (
         SELECT mktsegment, cents,
                CAST(NTILE(4) OVER (PARTITION BY mktsegment
                                    ORDER BY cents, o_orderkey) AS INT) AS quartile
         FROM j)
       SELECT mktsegment, quartile, COUNT(*) AS n_orders,
              MIN(cents) / 100.0 AS lo_price,
              MAX(cents) / 100.0 AS hi_price
       FROM t
       GROUP BY 1, 2
       ORDER BY mktsegment, quartile"""

  /** Conversion funnel (view → click → purchase, in order): per user the
    * first view, the first click AT OR AFTER that view, and the first
    * purchase at or after that click; reported as one row of stage counts.
    * Three grouped aggregations chained by user-keyed joins — each stage's
    * survivor set only shrinks, so the joins get cheaper down the funnel;
    * everything is user-partitioned (no global sort, no window over an
    * unpartitioned set). */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    // ONE events scan (was 5): the stage chain is three stacked
    // whole-partition windows over a single user-keyed exchange — each
    // stage's conditional min can reference the previous stage's column,
    // which the join-per-stage formulation re-scanned the corpus to get.
    // distinct() collapses to one row per user (stage times are
    // per-user constants; NULL users keep their row, matching the old
    // groupBy semantics), then one tiny final aggregate.
    val w = Window
      .partitionBy("user_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables
      .events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("v_ts", min(when(col("event_type") === "view", col("ts_us"))).over(w))
      .withColumn(
        "c_ts",
        min(when(col("event_type") === "click" && col("ts_us") >= col("v_ts"), col("ts_us")))
          .over(w))
      .withColumn(
        "p_ts",
        min(when(col("event_type") === "purchase" && col("ts_us") >= col("c_ts"), col("ts_us")))
          .over(w))
      .select(col("user_id"), col("v_ts"), col("c_ts"), col("p_ts"))
      .distinct()
      .agg(
        count(when(col("v_ts").isNotNull, 1)).as("n_view"),
        count(when(col("c_ts").isNotNull, 1)).as("n_view_click"),
        count(when(col("p_ts").isNotNull, 1)).as("n_view_click_purchase"))
  }

  val funnelSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
       v AS (SELECT user_id, MIN(ts_us) AS v_ts FROM e WHERE event_type = 'view' GROUP BY 1),
       c AS (SELECT e.user_id, MIN(e.ts_us) AS c_ts
             FROM e JOIN v ON e.user_id = v.user_id
             WHERE e.event_type = 'click' AND e.ts_us >= v.v_ts GROUP BY 1),
       p AS (SELECT e.user_id, MIN(e.ts_us) AS p_ts
             FROM e JOIN c ON e.user_id = c.user_id
             WHERE e.event_type = 'purchase' AND e.ts_us >= c.c_ts GROUP BY 1)
       SELECT (SELECT COUNT(*) FROM v) AS n_view,
              (SELECT COUNT(*) FROM c) AS n_view_click,
              (SELECT COUNT(*) FROM p) AS n_view_click_purchase"""

  /** Weekly cohort retention matrix: each user's cohort is their first
    * active ISO week; count distinct users from cohort `c` active in week
    * `w`. Two shuffles — a per-user min (map-side-combined) and the
    * (cohort, week) distinct count; the cohort table joins back to events
    * on user_id (shuffle join: both sides are user-keyed and large at
    * 100 TB — AQE handles relative sizing). No window over an
    * unpartitioned sort anywhere. */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .events(s, dir)
      .select(col("user_id"), unix_micros(date_trunc("week", col("ts"))).as("week_us"))
    val cohorts = e
      .groupBy("user_id")
      .agg(min(col("week_us")).as("cohort_us"))
    e.join(cohorts, "user_id")
      .groupBy("cohort_us", "week_us")
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_us", "week_us")
  }

  val retentionSql: String =
    """WITH e AS (
         SELECT user_id, epoch_us(date_trunc('week', ts)) AS week_us FROM events),
       cohorts AS (SELECT user_id, MIN(week_us) AS cohort_us FROM e GROUP BY 1)
       SELECT cohort_us, week_us, COUNT(DISTINCT e.user_id) AS n_active
       FROM e JOIN cohorts USING (user_id)
       GROUP BY 1, 2
       ORDER BY cohort_us, week_us"""

  /** Calendar gap-fill + forward fill: per user, one row per DAY between
    * that user's first and last active day — missing days materialized
    * (`is_gap`) and `filled_value` carried forward from the last observed
    * day. The regularization step that turns ragged event streams into
    * the dense per-key time series downstream models and reports expect.
    *
    * Scale shape: the grid derives from each user's OWN [min, max] span
    * (`sequence` + `explode` over an already-aggregated frame — never a
    * global-calendar cross join, and no row beyond the answer itself),
    * the daily rollup is one partial-aggregated shuffle on (user, day) in
    * exact integer cents, and the fill is a user-partitioned window —
    * bounded state per key, keys spread across executors, no
    * unpartitioned sort anywhere. Days ride as epoch-micros bigints
    * (`*_us`, the module's timestamp discipline). */
  def gapfill(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val daily = Tables
      .events(s, dir)
      .groupBy(col("user_id"), unix_micros(date_trunc("day", col("ts"))).as("day_us"))
      .agg((sum(cents("value")) / 100.0).as("day_value"))
    val grid = daily
      .groupBy("user_id")
      .agg(min(col("day_us")).as("d0"), max(col("day_us")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"), lit(dayUs))).as("day_us"))
    val w = Window
      .partitionBy("user_id")
      .orderBy("day_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(daily, Seq("user_id", "day_us"), "left")
      .select(
        col("user_id"),
        col("day_us"),
        col("day_value"),
        col("day_value").isNull.as("is_gap"),
        last(col("day_value"), ignoreNulls = true).over(w).as("filled_value"))
  }

  /** Linear interpolation across daily gaps — [[gapfill]]'s second-order
    * sibling (LOCF answers "what was the level", interpolation answers
    * "what was the trend"): for each missing day, value = prev +
    * (next − prev) · offset/len between the flanking OBSERVED days.
    * The grid spans [first, last] observed day per user, so every gap
    * has both ends by construction; a NULL-sum observed day (corrupt
    * values) propagates NULL rather than fabricating a reading.
    *
    * Exactness: daily sums stay INTEGER cents; offset/len are exact
    * integer DAY counts (micros DIV day); the interpolation is one fixed
    * float expression over those exact integers — same integers → same
    * doubles in DuckDB. The CASE guards the observed-day branch (len = 0
    * there — lazy CASE evaluation is what keeps the division defined).
    *
    * Scale shape: identical to [[gapfill]] — per-user grid explode,
    * one join, four IGNORE-NULLS windows over the same (user, day)
    * partition ordering (ONE window sort serves all four), bounded
    * state per key. */
  def interpolate(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val daily = Tables
      .events(s, dir)
      .groupBy(col("user_id"), unix_micros(date_trunc("day", col("ts"))).as("day_us"))
      .agg(sum(cents("value")).as("day_cents"))
    val grid = daily
      .groupBy("user_id")
      .agg(min(col("day_us")).as("d0"), max(col("day_us")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"), lit(dayUs))).as("day_us"))
    val base = Window.partitionBy("user_id").orderBy("day_us")
    val wPrev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("day_cents").isNotNull, col("day_us"))
    grid
      .join(daily, Seq("user_id", "day_us"), "left")
      .withColumn("pc", last(col("day_cents"), ignoreNulls = true).over(wPrev))
      .withColumn("pd", last(obsDay, ignoreNulls = true).over(wPrev))
      .withColumn("nc", first(col("day_cents"), ignoreNulls = true).over(wNext))
      .withColumn("nd", first(obsDay, ignoreNulls = true).over(wNext))
      .select(
        col("user_id"),
        col("day_us"),
        col("day_cents").isNull.as("is_gap"),
        expr(s"""ROUND(CASE WHEN day_cents IS NOT NULL
                   THEN day_cents / CAST(100 AS DOUBLE)
                   ELSE (CAST(pc AS DOUBLE)
                         + CAST((nc - pc) * ((day_us - pd) DIV $dayUs) AS DOUBLE)
                           / ((nd - pd) DIV $dayUs))
                        / CAST(100 AS DOUBLE) END, 4)""").as("value"))
  }

  val interpolateSql: String =
    """WITH daily AS (
         SELECT user_id, epoch_us(date_trunc('day', ts)) AS day_us,
                CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS day_cents
         FROM events GROUP BY 1, 2),
       spans AS (SELECT user_id, MIN(day_us) AS d0, MAX(day_us) AS d1 FROM daily GROUP BY 1),
       grid AS (SELECT user_id, UNNEST(generate_series(d0, d1, 86400000000)) AS day_us
                FROM spans),
       j AS (
         SELECT user_id, day_us, day_cents,
                last_value(day_cents IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY day_us
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
                last_value(CASE WHEN day_cents IS NOT NULL THEN day_us END IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY day_us
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
                first_value(day_cents IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY day_us
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
                first_value(CASE WHEN day_cents IS NOT NULL THEN day_us END IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY day_us
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
         FROM grid LEFT JOIN daily USING (user_id, day_us))
       SELECT user_id, day_us,
              day_cents IS NULL AS is_gap,
              ROUND(CASE WHEN day_cents IS NOT NULL
                    THEN day_cents / CAST(100 AS DOUBLE)
                    ELSE (CAST(pc AS DOUBLE)
                          + CAST((nc - pc) * ((day_us - pd) // 86400000000) AS DOUBLE)
                            / ((nd - pd) // 86400000000))
                         / CAST(100 AS DOUBLE) END, 4) AS value
       FROM j
       ORDER BY user_id, day_us"""

  val gapfillSql: String =
    """WITH daily AS (
         SELECT user_id, epoch_us(date_trunc('day', ts)) AS day_us,
                SUM(CAST(FLOOR(value * 100) AS BIGINT)) / 100.0 AS day_value
         FROM events GROUP BY 1, 2),
       spans AS (SELECT user_id, MIN(day_us) AS d0, MAX(day_us) AS d1 FROM daily GROUP BY 1),
       grid AS (SELECT user_id, UNNEST(generate_series(d0, d1, 86400000000)) AS day_us
                FROM spans)
       SELECT user_id, day_us, day_value,
              day_value IS NULL AS is_gap,
              last_value(day_value IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY day_us
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
       FROM grid LEFT JOIN daily USING (user_id, day_us)
       ORDER BY user_id, day_us"""

  /** Trailing-window z-score anomaly detection: flag each event whose
    * value sits more than 3σ from the mean of the SAME user's previous
    * ≤ 20 events (window excludes the current row, so an outlier never
    * masks itself; ≥ 10 priors required, zero-variance windows skipped —
    * no division by zero, no ±Inf z). The monitoring primitive behind
    * "this user's metric just jumped".
    *
    * Exactness across engines: the window aggregates are INTEGER moments
    * — count, Σcents, Σcents² — summed exactly in integer space in both
    * engines (long here, BIGINT/HUGEINT in DuckDB; the envelope below
    * caps Σc² at ~5·10¹⁸, inside Long but NOT always inside double-exact
    * 2⁵³ — exactness therefore rests on both engines casting the SAME
    * exact integer to double at the same expression position, same IEEE
    * nearest rounding, not on the sums being double-representable). The
    * mean/variance/z then evaluate a fixed IEEE expression over
    * identical doubles: bit-identical, no tolerance. The one float op
    * before the moments is the module's usual deterministic
    * `floor(value·100)`.
    *
    * Metric-envelope guard: a value with \|v\| > 5·10⁶ yields NULL cents
    * — "no observation", the [[rollingMedian]] NULL convention — because
    * beyond that the 20-row Σcents² overflows Long and one corrupt
    * telemetry row would kill the whole monitoring job (ANSI overflow;
    * found by the pathological-events sweep). NULL rows still occupy
    * their ROWS-frame slot in both engines (count skips them, the frame
    * does not), and a NaN value lands in the guard's false branch the
    * same way. The oracle applies the identical CASE.
    *
    * Scale shape: one user-partitioned window (bounded 20-row state per
    * key, keys spread across executors), then a filter — no global sort,
    * no second pass. */
  def anomaly(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(-20, -1)
    val c = Tables
      .events(s, dir)
      .select(
        col("event_id"),
        col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("value"),
        when(abs(col("value")) <= lit(5.0e6), cents("value")).as("cents"))
    val stats = c
      .withColumn("n", count(col("cents")).over(w))
      .withColumn("s", sum(col("cents")).over(w))
      .withColumn("s2", sum(col("cents") * col("cents")).over(w))
    val mean = col("s").cast("double") / col("n")
    val vari = (col("s2") - col("s").cast("double") * col("s") / col("n")) / col("n")
    stats
      .filter(col("n") >= 10 && vari > 0 && abs(col("cents") - mean) > lit(3) * sqrt(vari))
      .select(
        col("event_id"),
        col("user_id"),
        col("ts_us"),
        col("value"),
        round((col("cents") - mean) / sqrt(vari), 4).as("z"))
  }

  val anomalySql: String =
    """WITH c AS (
         SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
                CASE WHEN ABS(value) <= 5000000.0
                     THEN CAST(FLOOR(value * 100) AS BIGINT) END AS cents
         FROM events),
       w AS (
         SELECT *,
                COUNT(cents) OVER win AS n,
                SUM(cents) OVER win AS s,
                SUM(cents * cents) OVER win AS s2
         FROM c
         WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
       SELECT event_id, user_id, ts_us, value,
              ROUND((cents - CAST(s AS DOUBLE) / n) /
                    sqrt((s2 - CAST(s AS DOUBLE) * s / n) / n), 4) AS z
       FROM w
       WHERE n >= 10 AND (s2 - CAST(s AS DOUBLE) * s / n) / n > 0
         AND ABS(cents - CAST(s AS DOUBLE) / n) >
             3 * sqrt((s2 - CAST(s AS DOUBLE) * s / n) / n)
       ORDER BY event_id"""

  /** Rolling median — the robust sibling of [[movingAvg]]: per user, the
    * exact lower median of the trailing 21 values (current + 20
    * preceding), in integer cents. A median window is a HOLISTIC
    * aggregate (no partial-merge form), but over a BOUNDED frame it's
    * just `sort_array(collect_list(...))` of ≤ 21 ints picked at
    * ⌈n/2⌉ — per-row state bounded by the frame, partitioned by user,
    * scan-linear. Lower-median (no interpolation) keeps both engines
    * integer-exact; DuckDB replays it with the same sorted-list
    * expression rather than its native `median()` (which interpolates
    * on even counts). NULL values are "no observation" in BOTH engines:
    * Spark's collect_list drops them natively, the oracle list_filters
    * them explicitly (DuckDB's LIST keeps NULLs — the asymmetry would
    * otherwise shift the median index), and a window of only-NULLs
    * yields a NULL median (guarded — element_at(…, 0) would throw). */
  def rollingMedian(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(-20, 0)
    Tables
      .events(s, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"), cents("value").as("c"))
      .withColumn("win", sort_array(collect_list(col("c")).over(w)))
      .select(
        col("event_id"),
        col("user_id"),
        col("ts_us"),
        (col("c") / 100.0).as("value"),
        when(
          size(col("win")) > 0,
          element_at(col("win"), ((size(col("win")) + 1) / 2).cast("int")) / 100.0)
          .as("rolling_median"))
  }

  val rollingMedianSql: String =
    """WITH e AS (
         SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                CAST(FLOOR(value * 100.0) AS BIGINT) AS c
         FROM events),
       win AS (
         SELECT event_id, user_id, ts_us, c,
                list_sort(list_filter(
                  LIST(c) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS BETWEEN 20 PRECEDING AND CURRENT ROW),
                  x -> x IS NOT NULL)) AS w
         FROM e)
       SELECT event_id, user_id, ts_us,
              c / 100.0 AS value,
              CASE WHEN len(w) > 0
                   THEN w[CAST((len(w) + 1) // 2 AS INT)] / 100.0 END AS rolling_median
       FROM win
       ORDER BY user_id, ts_us, event_id"""

  /** Seasonality profile: event count and exact value mass per
    * (day-of-week × hour-of-day) cell — the "when does traffic happen"
    * heatmap behind capacity planning and anomaly baselines (an hourly
    * count is only anomalous relative to ITS cell). `pct_events` is each
    * cell's share of all events.
    *
    * Cross-engine care: Spark's `dayofweek` is 1-7 (Sunday = 1), DuckDB's
    * `date_part('dow')` is 0-6 (Sunday = 0) — normalized to 0 = Sunday
    * here. Sums are integer cents (module discipline). Scale shape: one
    * grouped aggregate to a 168-cell frame (map-side partials), totals
    * via a window over that BOUNDED frame (the batchDrift argument —
    * never a corpus-sized OVER ()). */
  def seasonality(s: SparkSession, dir: String): DataFrame = {
    val all = Window.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    Tables
      .events(s, dir)
      .groupBy(
        (dayofweek(col("ts")) - 1).as("dow"),
        hour(col("ts")).as("hod"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(cents("value")) / 100.0).as("total_value"))
      .withColumn("tot", sum(col("n_events")).over(all))
      // integer-exact HALF-UP rounding of the share ([[exactRoundSql]]):
      // never a ROUND(double) boundary flip
      .selectExpr(
        "dow",
        "hod",
        "n_events",
        "total_value",
        exactRoundSql("n_events * 100", "tot", 10000) + " AS pct_events")
      .orderBy("dow", "hod")
  }

  val seasonalitySql: String =
    """WITH cells AS (
         SELECT CAST(date_part('dow', ts) AS INT) AS dow,
                CAST(date_part('hour', ts) AS INT) AS hod,
                COUNT(*) AS n_events,
                SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) / 100.0 AS total_value
         FROM events GROUP BY 1, 2),
       t AS (
         SELECT *, CAST(SUM(n_events) OVER () AS BIGINT) AS tot FROM cells)
       SELECT dow, hod, n_events, total_value,
              CAST(((n_events * 100) // tot) * 10000
                   + (2 * ((n_events * 100) % tot) * 10000 + tot) // (2 * tot)
                AS DOUBLE) / 10000.0 AS pct_events
       FROM t
       ORDER BY dow, hod"""

  /** Daily OHLC (open/high/low/close) per event type — the time-series
    * resample every metrics pipeline runs over its event values, plus the
    * exact-cents daily sum and valid-row count.
    *
    * Determinism discipline: open/close are the rows ranked FIRST/LAST by
    * the total order (ts_us, event_id) inside each (day, type) cell — the
    * module's standard tie-break, so equal-timestamp events pick the same
    * row in both engines. Values ride the [[anomaly]] metric envelope
    * (|v| ≤ $5M → integer cents, else NULL = "no observation", which also
    * maps NaN/±huge corrupt rows out instead of crashing or silently
    * zeroing them); rows with no observation are dropped before ranking so
    * open/close always carry a real value.
    *
    * Scale shape: ONE hash exchange on the (day, type) cell key — both
    * row_number windows and the final aggregate share that partitioning
    * (two in-partition sorts, no second shuffle; plan-pinned in
    * ScaleSpec). Day keys are epoch-day longs via date_trunc (module
    * convention — no DATE dtype drift, no session-timezone surprises). */
  def ohlc(s: SparkSession, dir: String): DataFrame = {
    val cell = Seq(col("day_us"), col("event_type"))
    val wAsc = Window.partitionBy(cell: _*).orderBy(col("ts_us").asc, col("event_id").asc)
    val wDesc = Window.partitionBy(cell: _*).orderBy(col("ts_us").desc, col("event_id").desc)
    Tables
      .events(s, dir)
      .select(
        unix_micros(date_trunc("day", col("ts"))).as("day_us"),
        col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id"),
        when(abs(col("value")) <= lit(5.0e6), cents("value")).as("cents"))
      .filter(col("cents").isNotNull)
      .withColumn("rn_o", row_number().over(wAsc))
      .withColumn("rn_c", row_number().over(wDesc))
      .groupBy(col("day_us"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(when(col("rn_o") === 1, col("cents"))) / 100.0).as("open"),
        (max(col("cents")) / 100.0).as("high"),
        (min(col("cents")) / 100.0).as("low"),
        (max(when(col("rn_c") === 1, col("cents"))) / 100.0).as("close"),
        (sum(col("cents")) / 100.0).as("total_value"))
  }

  val ohlcSql: String =
    """WITH e AS (
         SELECT epoch_us(date_trunc('day', ts)) AS day_us, event_type,
                epoch_us(ts) AS ts_us, event_id,
                CASE WHEN ABS(value) <= 5000000.0
                     THEN CAST(FLOOR(value * 100.0) AS BIGINT) END AS cents
         FROM events),
       r AS (
         SELECT *,
                ROW_NUMBER() OVER (PARTITION BY day_us, event_type
                                   ORDER BY ts_us ASC, event_id ASC) AS rn_o,
                ROW_NUMBER() OVER (PARTITION BY day_us, event_type
                                   ORDER BY ts_us DESC, event_id DESC) AS rn_c
         FROM e WHERE cents IS NOT NULL)
       SELECT day_us, event_type, COUNT(*) AS n_events,
              MAX(CASE WHEN rn_o = 1 THEN cents END) / 100.0 AS open,
              MAX(cents) / 100.0 AS high,
              MIN(cents) / 100.0 AS low,
              MAX(CASE WHEN rn_c = 1 THEN cents END) / 100.0 AS close,
              SUM(cents) / 100.0 AS total_value
       FROM r
       GROUP BY day_us, event_type
       ORDER BY day_us, event_type"""

  /** Funnel latency distribution: how long from a user's first `view` to
    * their first `purchase` at or after it, reported as banded counts
    * (< 1h, < 1d, < 7d, ≥ 7d) with exact min/max and mean latency — the
    * "how fast do converters convert" companion to [[funnel]]'s "how many
    * convert".
    *
    * Determinism discipline: latency is integer SECONDS (`DIV` on
    * epoch-micros — exact long arithmetic), the per-band mean is one
    * exact long sum divided once (never a float aggregation), and bands
    * are closed-form CASE cuts — both engines bucket identically.
    *
    * Scale shape: two user-keyed grouped aggregates chained by a
    * user-keyed join (the purchase side only sees users who viewed —
    * survivor sets shrink down the funnel, same as [[funnel]]), then a
    * 4-group band rollup whose shuffle carries one partial row per
    * (band, map task). No windows, no unpartitioned sort. */
  def conversionTime(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val v = e
      .filter(col("event_type") === "view")
      .groupBy("user_id")
      .agg(min(col("ts_us")).as("v_ts"))
    // v_ts is constant per user, so min() carries it through the aggregate
    val p = e
      .filter(col("event_type") === "purchase")
      .join(v, "user_id")
      .filter(col("ts_us") >= col("v_ts"))
      .groupBy("user_id")
      .agg(min(col("ts_us")).as("p_ts"), min(col("v_ts")).as("v_ts"))
    val lat = p.select(col("user_id"), expr("(p_ts - v_ts) DIV 1000000").as("lat_s"))
    val band = when(col("lat_s") < 3600L, struct(lit(1).as("band_ord"), lit("lt_1h").as("band")))
      .when(col("lat_s") < 86400L, struct(lit(2).as("band_ord"), lit("lt_1d").as("band")))
      .when(col("lat_s") < 604800L, struct(lit(3).as("band_ord"), lit("lt_7d").as("band")))
      .otherwise(struct(lit(4).as("band_ord"), lit("ge_7d").as("band")))
    lat
      .select(band.as("b"), col("lat_s"))
      .groupBy(col("b.band_ord").as("band_ord"), col("b.band").as("band"))
      .agg(
        count(lit(1)).as("n_users"),
        round(sum(col("lat_s")) / count(lit(1)).cast("double"), 2).as("avg_latency_s"),
        min(col("lat_s")).as("min_latency_s"),
        max(col("lat_s")).as("max_latency_s"))
      .orderBy("band_ord")
  }

  val conversionTimeSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
       v AS (SELECT user_id, MIN(ts_us) AS v_ts FROM e WHERE event_type = 'view' GROUP BY 1),
       p AS (SELECT e.user_id, MIN(e.ts_us) AS p_ts, MIN(v.v_ts) AS v_ts
             FROM e JOIN v ON e.user_id = v.user_id
             WHERE e.event_type = 'purchase' AND e.ts_us >= v.v_ts GROUP BY 1),
       lat AS (SELECT user_id, (p_ts - v_ts) // 1000000 AS lat_s FROM p),
       banded AS (
         SELECT lat_s,
                CASE WHEN lat_s < 3600 THEN 1 WHEN lat_s < 86400 THEN 2
                     WHEN lat_s < 604800 THEN 3 ELSE 4 END AS band_ord,
                CASE WHEN lat_s < 3600 THEN 'lt_1h' WHEN lat_s < 86400 THEN 'lt_1d'
                     WHEN lat_s < 604800 THEN 'lt_7d' ELSE 'ge_7d' END AS band
         FROM lat)
       SELECT band_ord, band, COUNT(*) AS n_users,
              ROUND(SUM(lat_s) / CAST(COUNT(*) AS DOUBLE), 2) AS avg_latency_s,
              MIN(lat_s) AS min_latency_s,
              MAX(lat_s) AS max_latency_s
       FROM banded
       GROUP BY 1, 2
       ORDER BY band_ord"""

  /** Top-10 most-travelled 3-step event-type paths (sequential pattern
    * census): for every user, each consecutive (e1 → e2 → e3) triple in
    * (ts, event_id) order is one path observation; paths ranked by count
    * with a full lexicographic tie-break so both engines cut the same 10.
    * The navigation-mining staple ("view → click → purchase vs view →
    * error → view") the funnel operators answer only for one fixed path.
    *
    * Scale shape: two LEADs share ONE user-partitioned sort (no
    * self-joins — the classic sequence join formulation is two fact-fact
    * joins; the window form is a single user-keyed exchange), the census
    * groupBy is bounded by |event types|³ (125 here — partial-agg absorbs
    * it map-side), and the final cut is a TakeOrdered, never a global
    * sort. NULL user/ts/type rows are dropped up front (a NULL hop is
    * not a path; adjacency then skips them deterministically in both
    * engines). */
  def paths(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables
      .events(s, dir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"), col("event_type"))
      .select(
        col("event_type").as("e1"),
        lead("event_type", 1).over(w).as("e2"),
        lead("event_type", 2).over(w).as("e3"))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(10)
  }

  val pathsSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
                  FROM events
                  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
       t AS (SELECT event_type AS e1,
                    lead(event_type, 1) OVER w AS e2,
                    lead(event_type, 2) OVER w AS e3
             FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
       SELECT e1, e2, e3, COUNT(*) AS n
       FROM t WHERE e2 IS NOT NULL AND e3 IS NOT NULL
       GROUP BY 1, 2, 3
       ORDER BY n DESC, e1, e2, e3
       LIMIT 10"""

  /** Per-user time-weighted average value (TWAP): each observation is
    * weighted by the exact integer seconds until the user's NEXT valid
    * observation (the value "held" for that interval); the last
    * observation has no interval and carries no weight. Out-of-envelope
    * rows (NULL/NaN/|v| > 5·10⁶ — [[anomaly]]'s metric envelope) are
    * excluded as ROWS, so the preceding valid observation's interval
    * spans across them: a corrupt reading neither crashes the job nor
    * truncates the weighting.
    *
    * Numeric discipline: weights are exact integer seconds (µs DIV 10⁶),
    * values exact integer cents; per-row products stay ≤ ~10¹⁶ (long-
    * safe) but the per-user SUM can pass 2⁶³, so both engines accumulate
    * in wide exact integers (DECIMAL(38,0) / HUGEINT — [[Analytics
    * .moments]]' discipline) and divide ONCE at the end (identical
    * expression → identical doubles before the 4-dp round).
    *
    * Scale shape: one user-partitioned sort carries the LEAD, the rollup
    * groupBy rides the same key distribution; output ∝ users. Same-µs
    * ties get weight 0 from the deterministic (ts, event_id) order. */
  def twap(s: SparkSession, dir: String): DataFrame = {
    Tables
      .events(s, dir)
      .filter(
        col("user_id").isNotNull && col("ts").isNotNull && col("value").isNotNull &&
          !isnan(col("value")) && abs(col("value")) <= 5.0e6)
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id"),
        cents("value").as("c"))
      .withColumn("dt_s", expr("(lead(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - ts_us) DIV 1000000"))
      .groupBy("user_id")
      .agg(
        count(col("dt_s")).as("n_obs"),
        sum(col("dt_s")).as("total_s"),
        round(
          sum((col("c") * col("dt_s")).cast("decimal(38,0)")).cast("double") /
            (lit(100.0) * sum(col("dt_s")).cast("double")),
          4).as("twap"))
      .filter(col("total_s") > 0)
  }

  val twapSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                         CAST(FLOOR(value * 100) AS BIGINT) AS c
                  FROM events
                  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
                    AND NOT isnan(value) AND abs(value) <= 5000000),
       d AS (SELECT user_id, c,
                    (lead(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - ts_us) // 1000000 AS dt_s
             FROM e)
       SELECT user_id, COUNT(dt_s) AS n_obs, CAST(SUM(dt_s) AS BIGINT) AS total_s,
              ROUND(CAST(SUM(CAST(c * dt_s AS HUGEINT)) AS DOUBLE) /
                    (100.0 * CAST(SUM(dt_s) AS DOUBLE)), 4) AS twap
       FROM d
       GROUP BY 1
       HAVING SUM(dt_s) > 0
       ORDER BY user_id"""

  /** Per-user least-squares trend + 7-day forecast — the "is this metric
    * drifting" primitive behind capacity alerts and per-account health
    * scores, as ONE map-side-combined aggregate. OLS over (epoch-day x,
    * cents y) has the closed form
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *   ŷ(x*) = (Σy·Σx² − Σx·Σxy + num·x*) / den
    * so the whole fit is FIVE associative integer sums per user — exact,
    * order-independent, partial-aggregatable — and division touches a
    * double exactly once per output column (the [[twap]] discipline).
    *
    * Numeric envelope: x = epoch day ≤ ~2·10⁴, y = cents ≤ 5·10⁸
    * ([[anomaly]]'s metric envelope, out-of-envelope rows excluded as
    * rows), so per-row products x·y ≤ 10¹³ are long-safe; the per-user
    * sums and the cross-products (Σx·Σy ≤ ~10³¹ even at 10⁹ events/user)
    * accumulate in DECIMAL(38,0) / HUGEINT ([[Analytics.moments]]'
    * discipline). Pre-epoch timestamps are excluded as rows (the
    * envelope rule): a negative unix time would make the epoch-day
    * division sign-carrying, where Spark's `div` truncates but
    * DuckDB's `//` floors — the exclusion keeps every integer
    * division in this operator on non-negative operands. The
    * sign-carrying arithmetic (slope can be negative) happens only in
    * the sign-decomposed exact rounding.
    *
    * Scale shape: one partial-aggregated shuffle on user_id, output ∝
    * users; no window, no sort. A vertical line (all observations on one
    * day) has den = 0 — slope and forecast are NULL, not an error. */
  def trend(s: SparkSession, dir: String): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val agg = Tables
      .events(s, dir)
      .filter(
        col("user_id").isNotNull && col("ts").isNotNull && col("value").isNotNull &&
          !isnan(col("value")) && abs(col("value")) <= 5.0e6 &&
          unix_micros(col("ts")) >= 0)
      .select(
        col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("x"),
        cents("value").as("c"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).cast("long").as("n_obs"),
        max(col("x")).as("day_last"),
        sum(dec(col("x"))).as("sx"),
        sum(dec(col("c"))).as("sy"),
        sum(dec(col("x") * col("x"))).as("sxx"),
        sum(dec(col("x") * col("c"))).as("sxy"))
    val n = dec(col("n_obs"))
    val num = n * col("sxy") - col("sx") * col("sy")
    val den = n * col("sxx") - col("sx") * col("sx")
    val fcNum =
      col("sy") * col("sxx") - col("sx") * col("sxy") +
        num * dec(col("day_last") + lit(7L))
    agg
      .withColumn("num", num)
      .withColumn("den", den)
      .withColumn("fc_num", fcNum)
      .selectExpr(
        "user_id",
        "n_obs",
        "day_last",
        "CASE WHEN den <> 0 THEN " + exactRoundSql("num", "den * 100", 1000000) +
          " END AS slope_per_day",
        "CASE WHEN den <> 0 THEN " + exactRoundSql("fc_num", "den * 100", 10000) +
          " END AS forecast_7d")
  }

  /** SQL twin: the identical five sums in HUGEINT, the identical two
    * integer-exact roundings ([[exactRoundSql]]'s formula in
    * HUGEINT/`//`); outputs cast to BIGINT/DOUBLE so no HUGEINT ever
    * reaches the driver's pandas hashing. */
  val trendSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS x,
                         CAST(FLOOR(value * 100) AS BIGINT) AS c
                  FROM events
                  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
                    AND NOT isnan(value) AND abs(value) <= 5000000
                    AND epoch_us(ts) >= 0),
       agg AS (SELECT user_id,
                      CAST(COUNT(*) AS BIGINT) AS n_obs,
                      CAST(MAX(x) AS BIGINT) AS day_last,
                      SUM(CAST(x AS HUGEINT)) AS sx,
                      SUM(CAST(c AS HUGEINT)) AS sy,
                      SUM(CAST(x * x AS HUGEINT)) AS sxx,
                      SUM(CAST(x * c AS HUGEINT)) AS sxy
               FROM e GROUP BY 1),
       fit AS (SELECT user_id, n_obs, day_last,
                      n_obs * sxy - sx * sy AS num,
                      n_obs * sxx - sx * sx AS den,
                      sy * sxx - sx * sxy
                        + (n_obs * sxy - sx * sy) * CAST(day_last + 7 AS HUGEINT) AS fc_num
               FROM agg)
       SELECT user_id, n_obs, day_last,
              CASE WHEN den <> 0
                   THEN (CASE WHEN num < 0 THEN -1.0 ELSE 1.0 END) *
                        CAST((ABS(num) // (den * 100)) * 1000000
                             + (2 * (ABS(num) % (den * 100)) * 1000000 + den * 100)
                               // (2 * den * 100) AS DOUBLE) / 1000000.0
              END AS slope_per_day,
              CASE WHEN den <> 0
                   THEN (CASE WHEN fc_num < 0 THEN -1.0 ELSE 1.0 END) *
                        CAST((ABS(fc_num) // (den * 100)) * 10000
                             + (2 * (ABS(fc_num) % (den * 100)) * 10000 + den * 100)
                               // (2 * den * 100) AS DOUBLE) / 10000.0
              END AS forecast_7d
       FROM fit
       ORDER BY user_id"""

  /** Per-user CUSUM changepoint — [[trend]] asks "is this metric
    * drifting"; this asks "WHEN did it jump": the split point k that
    * maximizes the cumulative deviation from the user's own mean, the
    * classic CUSUM statistic. The float-free move: the textbook
    * statistic max_k |P_k − k·S/n| (P_k = prefix sum of cents, S = total,
    * n = count) is scaled by n to
    *   D_k = n·P_k − k·S
    * — EXACT integer arithmetic, so the argmax (and therefore the
    * reported changepoint) can never flip on float noise or engine
    * rounding; ties break to the EARLIEST k. Direction falls out of the
    * same integers: mean_after − mean_before = −D_k / (k·(n−k)), so
    * sign(−D_k) classifies up/down/flat exactly. The two segment means
    * and the reported peak |D_k|/(n·100) — the textbook statistic back
    * in dollar units — are the only doubles, one division each at the
    * end (the [[twap]] discipline).
    *
    * Numeric envelope: cents ≤ 5·10⁸ ([[anomaly]]'s metric envelope,
    * out-of-envelope rows excluded as rows), so n·P_k ≤ n²·5·10⁸ passes
    * 2⁶³ around 4·10⁴ observations/user — D accumulates in
    * DECIMAL(38,0)/HUGEINT (safe past 10¹⁴ events/user).
    *
    * Scale shape: ONE user-partitioned sort carries row_number + the
    * running sum; n and S ride an unordered window over the same
    * exchange; the argmax is a map-side-combinable struct-max groupBy —
    * no second window over the event frame, no unpartitioned sort,
    * output ∝ users. Split candidates are k ∈ [1, n−1] (both segments
    * non-empty), so single-observation users drop out as a domain rule. */
  def changepoint(s: SparkSession, dir: String): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val wOrd = Window
      .partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("user_id")
    val best = Tables
      .events(s, dir)
      .filter(
        col("user_id").isNotNull && col("ts").isNotNull && col("value").isNotNull &&
          !isnan(col("value")) && abs(col("value")) <= 5.0e6)
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id"),
        cents("value").as("c"))
      .withColumn("k", row_number().over(wOrd))
      .withColumn("pk", sum(col("c")).over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("s_tot", sum(col("c")).over(wAll))
      .filter(col("k") < col("n"))
      .withColumn("d", dec(col("n")) * dec(col("pk")) - dec(col("k")) * dec(col("s_tot")))
      .groupBy("user_id")
      .agg(
        max(col("n")).cast("long").as("n_obs"),
        max(struct(
          abs(col("d")).as("absd"),
          (-col("k")).as("negk"),
          col("k").cast("long").as("k"),
          col("ts_us").as("cp_ts"),
          col("pk").as("pk"),
          col("d").as("d"),
          col("s_tot").as("s_tot"))).as("b"))
    best.selectExpr(
      "user_id",
      "n_obs",
      "b.k AS cp_k",
      "b.cp_ts AS cp_ts_us",
      "CASE WHEN b.d < 0 THEN 'up' WHEN b.d > 0 THEN 'down' ELSE 'flat' END AS direction",
      exactRoundSql("b.absd", "n_obs * 100", 10000) + " AS cusum_stat",
      exactRoundSql("b.pk", "b.k * 100", 10000) + " AS mean_before",
      exactRoundSql("b.s_tot - b.pk", "(n_obs - b.k) * 100", 10000) + " AS mean_after")
  }

  /** SQL twin: the identical scaled statistic in HUGEINT, the argmax as
    * a (absd DESC, k) row_number — the same (max |D|, earliest k) pick
    * the struct-max makes — and the identical integer-exact rounding
    * ([[exactRoundSql]]'s formula in HUGEINT/`//`). */
  val changepointSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                         CAST(FLOOR(value * 100) AS BIGINT) AS c
                  FROM events
                  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
                    AND NOT isnan(value) AND abs(value) <= 5000000),
       p AS (SELECT user_id, ts_us, c,
                    ROW_NUMBER() OVER w AS k,
                    SUM(c) OVER w AS pk,
                    COUNT(*) OVER (PARTITION BY user_id) AS n,
                    SUM(c) OVER (PARTITION BY user_id) AS s_tot
             FROM e
             WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       d AS (SELECT user_id, ts_us, k, pk, n, s_tot,
                    CAST(n AS HUGEINT) * pk - CAST(k AS HUGEINT) * s_tot AS dd
             FROM p WHERE k < n),
       r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ABS(dd) DESC, k) AS rk
             FROM d)
       SELECT user_id,
              CAST(n AS BIGINT) AS n_obs,
              CAST(k AS BIGINT) AS cp_k,
              ts_us AS cp_ts_us,
              CASE WHEN dd < 0 THEN 'up' WHEN dd > 0 THEN 'down' ELSE 'flat' END AS direction,
              CAST((ABS(dd) // (n * 100)) * 10000
                   + (2 * (ABS(dd) % (n * 100)) * 10000 + n * 100)
                     // (2 * n * 100) AS DOUBLE) / 10000.0 AS cusum_stat,
              (CASE WHEN pk < 0 THEN -1.0 ELSE 1.0 END) *
                CAST((ABS(CAST(pk AS HUGEINT)) // (k * 100)) * 10000
                     + (2 * (ABS(CAST(pk AS HUGEINT)) % (k * 100)) * 10000 + k * 100)
                       // (2 * k * 100) AS DOUBLE) / 10000.0 AS mean_before,
              (CASE WHEN s_tot - pk < 0 THEN -1.0 ELSE 1.0 END) *
                CAST((ABS(CAST(s_tot - pk AS HUGEINT)) // ((n - k) * 100)) * 10000
                     + (2 * (ABS(CAST(s_tot - pk AS HUGEINT)) % ((n - k) * 100)) * 10000
                        + (n - k) * 100)
                       // (2 * (n - k) * 100) AS DOUBLE) / 10000.0 AS mean_after
       FROM r WHERE rk = 1
       ORDER BY user_id"""

  /** Per-user lag-1/lag-7 autocorrelation — [[trend]] measures drift,
    * [[changepoint]] locates jumps; this measures MEMORY: does a user's
    * metric echo its previous observation (lag 1) or last week's
    * position in the cycle (lag 7 — the seasonality probe at the user
    * grain, where [[seasonality]] works at the corpus grain)? Pearson r
    * over (y_t, y_{t+k}) pairs with [[Analytics.corrQtyPrice]]'s exact
    * discipline: the five sums per lag are exact DECIMAL(38,0)/HUGEINT
    * integer sums (pairs = rows whose lead exists, NULL-skipping
    * aggregates in both engines), and the final r = (m·Σxy − ΣxΣy) /
    * (√(m·Σx²−(Σx)²)·√(m·Σy²−(Σy)²)) is one fixed float expression over
    * identically-derived doubles (sqrt admits no integer-exact rounding
    * — agg_corr's disclosed residual, same here). Degenerate lags
    * (under 2 pairs, or zero variance on either side) are NULL.
    *
    * Scale shape: ONE user-partitioned sort carries both leads; the
    * twelve sums fold in a single map-side-combined groupBy; output ∝
    * users. No self-join — lag pairing is the lead window. */
  def autocorr(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val base = Tables
      .events(s, dir)
      .filter(
        col("user_id").isNotNull && col("ts").isNotNull && col("value").isNotNull &&
          !isnan(col("value")) && abs(col("value")) <= 5.0e6)
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id"),
        cents("value").as("c"))
      .withColumn("y1", lead(col("c"), 1).over(w))
      .withColumn("y7", lead(col("c"), 7).over(w))
    def lagSums(yc: String, t: String) = Seq(
      count(col(yc)).as(s"m$t"),
      sum(when(col(yc).isNotNull, col("c")).cast(d38)).as(s"sx$t"),
      sum(col(yc).cast(d38)).as(s"sy$t"),
      sum((col("c") * col(yc)).cast(d38)).as(s"sxy$t"),
      sum(when(col(yc).isNotNull, col("c") * col("c")).cast(d38)).as(s"sxx$t"),
      sum((col(yc) * col(yc)).cast(d38)).as(s"syy$t"))
    val aggs = (count(lit(1)).as("n_obs") +: (lagSums("y1", "1") ++ lagSums("y7", "7")))
    val agg = base.groupBy("user_id").agg(aggs.head, aggs.tail: _*)
    def r(t: String): org.apache.spark.sql.Column = {
      val (m, sx, sy, sxy, sxx, syy) = (
        col(s"m$t").cast("double"), col(s"sx$t").cast("double"), col(s"sy$t").cast("double"),
        col(s"sxy$t").cast("double"), col(s"sxx$t").cast("double"), col(s"syy$t").cast("double"))
      val vx = m * sxx - sx * sx
      val vy = m * syy - sy * sy
      when(col(s"m$t") >= 2 && vx > 0 && vy > 0,
        round((m * sxy - sx * sy) / (sqrt(vx) * sqrt(vy)), 4))
    }
    agg.select(col("user_id"), col("n_obs"), r("1").as("acf_lag1"), r("7").as("acf_lag7"))
  }

  /** SQL twin: the same two leads over one window, the same NULL-skipping
    * integer sums in HUGEINT, the same fixed float expression. */
  val autocorrSql: String = {
    def lagSums(yc: String, t: String) =
      s"""COUNT($yc) AS m$t,
          SUM(CASE WHEN $yc IS NOT NULL THEN CAST(c AS HUGEINT) END) AS sx$t,
          SUM(CAST($yc AS HUGEINT)) AS sy$t,
          SUM(CAST(c * $yc AS HUGEINT)) AS sxy$t,
          SUM(CASE WHEN $yc IS NOT NULL THEN CAST(c * c AS HUGEINT) END) AS sxx$t,
          SUM(CAST($yc * $yc AS HUGEINT)) AS syy$t"""
    def r(t: String) =
      s"""CASE WHEN m$t >= 2
                AND CAST(m$t AS DOUBLE) * CAST(sxx$t AS DOUBLE)
                    - CAST(sx$t AS DOUBLE) * CAST(sx$t AS DOUBLE) > 0
                AND CAST(m$t AS DOUBLE) * CAST(syy$t AS DOUBLE)
                    - CAST(sy$t AS DOUBLE) * CAST(sy$t AS DOUBLE) > 0
               THEN ROUND((CAST(m$t AS DOUBLE) * CAST(sxy$t AS DOUBLE)
                           - CAST(sx$t AS DOUBLE) * CAST(sy$t AS DOUBLE)) /
                          (SQRT(CAST(m$t AS DOUBLE) * CAST(sxx$t AS DOUBLE)
                                - CAST(sx$t AS DOUBLE) * CAST(sx$t AS DOUBLE)) *
                           SQRT(CAST(m$t AS DOUBLE) * CAST(syy$t AS DOUBLE)
                                - CAST(sy$t AS DOUBLE) * CAST(sy$t AS DOUBLE))), 4)
          END"""
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                          CAST(FLOOR(value * 100) AS BIGINT) AS c
                   FROM events
                   WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
                     AND NOT isnan(value) AND abs(value) <= 5000000),
       l AS (SELECT user_id, c,
                    lead(c, 1) OVER w AS y1,
                    lead(c, 7) OVER w AS y7
             FROM e
             WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_obs,
                    ${lagSums("y1", "1")},
                    ${lagSums("y7", "7")}
             FROM l GROUP BY 1)
       SELECT user_id, n_obs, ${r("1")} AS acf_lag1, ${r("7")} AS acf_lag7
       FROM a
       ORDER BY user_id"""
  }

  /** RFM segmentation — the classic customer-value census (recency /
    * frequency / monetary quartile scores + a coarse segment label),
    * over orders like [[cohortLtv]]. Scores are EXACT quartiles: the
    * three measures melt into one (cust, measure, value) frame and ONE
    * [[Scale.globalRank]] pass partitioned by measure ranks all three
    * (deterministic (value, cust) tie order), [[Scale.ntileExpr]]'s
    * closed form assigns tiles bit-identically to both engines' NTILE,
    * and a conditional-aggregate pivot folds the scores back to one row
    * per customer. Ascending order ⇒ quartile 4 = most recent / most
    * frequent / highest spend, the standard RFM orientation. The
    * segment label is a fixed CASE over the three scores.
    *
    * Scale shape: the per-customer rollup is one map-side-combined
    * groupBy on custkey; the melt is a fixed ×3 narrow explode of THAT
    * bounded frame (never raw orders); the single globalRank sorts only
    * within value buckets (the win_ntile argument — no global sort);
    * the pivot re-aggregates on the same cust key. */
  def rfm(s: SparkSession, dir: String): DataFrame =
    rfmScores(rfmBase(Tables.orders(s, dir)))

  /** The per-customer RFM census — max recency / order count / cents sum,
    * all associative, so the SAME definition runs batch here and in
    * complete mode on an order stream
    * ([[graft.streaming.EventStreams.rfmCensus]], the
    * heavyHitters/wordCensus shared-code discipline). */
  private[graft] def rfmBase(orders: DataFrame): DataFrame =
    orders
      .filter(
        col("o_custkey").isNotNull && col("o_orderdate").isNotNull &&
          col("o_totalprice").isNotNull)
      .groupBy(col("o_custkey").as("cust"))
      .agg(
        max(expr("unix_date(cast(o_orderdate as date))").cast("long")).as("recency_day"),
        count(lit(1)).as("frequency"),
        sum(floor(col("o_totalprice") * 100.0).cast("long")).as("monetary_cents"))

  /** Quartile scoring + segmentation over a census frame — the second
    * aggregation level streaming cannot run in-query (multiple stateful
    * aggs unsupported), applied by the streaming sink per trigger to the
    * bounded census table (the keyCensus precedent). */
  private[graft] def rfmScores(base: DataFrame): DataFrame = {
    val melted = base.select(
      col("cust"),
      explode(array(
        struct(lit("r").as("measure"), col("recency_day").as("value")),
        struct(lit("f").as("measure"), col("frequency").as("value")),
        struct(lit("m").as("measure"), col("monetary_cents").as("value")))).as("mv"))
      .select(col("cust"), col("mv.measure").as("measure"), col("mv.value").as("value"))
    // quantileBounds: fixed-width min/max bounds would span ALL THREE
    // measures at once — monetary cents dwarf recency days and order
    // counts, so every r/f row would collapse into bucket 0 and rank as
    // two single-task full sorts. Quantile boundaries over the combined
    // distribution give each measure's value block ~1/3 of the buckets
    // by construction (each measure is 1/3 of the melted rows) — the
    // bucketed-sort guarantee holds for all three.
    val scored = Scale
      .globalRank(
        melted,
        Seq("measure"),
        col("value"),
        Seq(col("value"), col("cust")),
        quantileBounds = true)
      .withColumn("q", expr(Scale.ntileExpr(4)).cast("int"))
    // the measure VALUES ride the same pivot as the scores — no join back
    // to base (one fewer consumer of the census subtree, and a census fed
    // from a streaming memory sink can't hit self-join reference conflicts)
    scored
      .groupBy("cust")
      .agg(
        max(when(col("measure") === "r", col("value"))).as("recency_day"),
        max(when(col("measure") === "f", col("value"))).as("frequency"),
        max(when(col("measure") === "m", col("value"))).as("monetary_cents"),
        max(when(col("measure") === "r", col("q"))).as("r_score"),
        max(when(col("measure") === "f", col("q"))).as("f_score"),
        max(when(col("measure") === "m", col("q"))).as("m_score"))
      .select(
        col("cust").as("custkey"),
        col("recency_day"),
        col("frequency"),
        col("monetary_cents"),
        col("r_score"),
        col("f_score"),
        col("m_score"),
        when(col("r_score") >= 3 && col("f_score") >= 3 && col("m_score") >= 3, "champion")
          .when(col("r_score") >= 3, "recent")
          .when(col("f_score") >= 3 || col("m_score") >= 3, "lapsing_valuable")
          .otherwise("dormant")
          .as("segment"))
  }

  /** SQL twin: NTILE(4) per measure over the melted frame (the closed
    * form is bit-identical to NTILE under the total (value, cust)
    * order), the same pivot and CASE. */
  val rfmSql: String =
    """WITH base AS (
         SELECT o_custkey AS cust,
                CAST(MAX(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT)
                  AS recency_day,
                CAST(COUNT(*) AS BIGINT) AS frequency,
                CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS monetary_cents
         FROM orders
         WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
           AND o_totalprice IS NOT NULL
         GROUP BY 1),
       melted AS (
         SELECT cust, 'r' AS measure, recency_day AS value FROM base
         UNION ALL
         SELECT cust, 'f', frequency FROM base
         UNION ALL
         SELECT cust, 'm', monetary_cents FROM base),
       scored AS (
         SELECT cust, measure,
                CAST(NTILE(4) OVER (PARTITION BY measure ORDER BY value, cust) AS INT) AS q
         FROM melted),
       pivoted AS (
         SELECT cust,
                MAX(CASE WHEN measure = 'r' THEN q END) AS r_score,
                MAX(CASE WHEN measure = 'f' THEN q END) AS f_score,
                MAX(CASE WHEN measure = 'm' THEN q END) AS m_score
         FROM scored GROUP BY 1)
       SELECT base.cust AS custkey, recency_day, frequency, monetary_cents,
              r_score, f_score, m_score,
              CASE WHEN r_score >= 3 AND f_score >= 3 AND m_score >= 3 THEN 'champion'
                   WHEN r_score >= 3 THEN 'recent'
                   WHEN f_score >= 3 OR m_score >= 3 THEN 'lapsing_valuable'
                   ELSE 'dormant' END AS segment
       FROM base JOIN pivoted USING (cust)
       ORDER BY custkey"""

  /** Cohort LTV curves — [[retention]] answers "do cohorts come back";
    * this answers "what are they WORTH over time", the growth-analytics
    * staple beside it: customers are grouped by FIRST-ORDER month, and
    * each (cohort, age-in-months) cell reports active customers, revenue
    * cents and the running cumulative revenue per original cohort member
    * — the LTV curve a finance model reads off. (Orders, not events: the
    * event fixture's users all start within two days, so first-activity
    * cohorts are degenerate there; orders span 80 months.) Months are
    * exact integers (year·12 + month), revenue is exact cents, actives
    * are exact distinct counts; ONE double division at the end (the
    * [[twap]] discipline).
    *
    * Scale shape: the cohort assignment is a map-side-combined groupBy on
    * custkey (never a window over raw orders), orders join it back on the
    * same key (AQE-sized), the cell rollup is a second partial-aggregated
    * shuffle bounded by \|cohorts × ages\|, and the cumulative window
    * runs over that BOUNDED frame — no order-wide window or sort
    * anywhere. Cohort sizes ride the already-aggregated customer frame. */
  def cohortLtv(s: SparkSession, dir: String): DataFrame =
    cohortLtvScores(custMonthCensus(Tables.orders(s, dir)))

  /** Per-(customer, month) revenue census — ONE associative aggregate
    * (cents sums combine), so the SAME definition runs batch here and
    * in complete mode on an order stream
    * ([[graft.streaming.EventStreams.cohortCensus]], the rfmBase
    * discipline). Every downstream cohort quantity derives from this
    * frame: summing the census per cell equals summing raw orders, and
    * a customer appears once per (cohort, age) cell by construction. */
  private[graft] def custMonthCensus(orders: DataFrame): DataFrame =
    orders
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .select(
        col("o_custkey").as("cust"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).cast("long").as("m"),
        cents("o_totalprice").as("rc"))
      .groupBy("cust", "m")
      .agg(sum(col("rc")).as("rc"))

  /** Cohort assembly over a (cust, m, rc) census — min-month cohort
    * assignment, (cohort × age) cells, bounded cumulative window and
    * the exact ltv division: the second+ aggregation levels streaming
    * can't run in-query; the streaming sink applies this to the bounded
    * census per trigger (the rfmScores precedent).
    *
    * JOIN-FREE by construction: cohort assignment is a cust-partitioned
    * window min (not a groupBy joined back), and cohort_users rides the
    * cells themselves — every cohort member is active at age 0 (the
    * min-month row IS an age-0 row), so cohort size = first(n_active)
    * under the age order. Beyond saving two joins, this is what lets
    * the streaming sink score a memory-sink census: joining a streamed
    * view's aggregates back to itself trips Spark's conflicting-
    * reference resolution (the rfmScores lesson). */
  private[graft] def cohortLtvScores(o: DataFrame): DataFrame = {
    val cells = o
      .withColumn("cohort_month", min(col("m")).over(Window.partitionBy("cust")))
      .groupBy(col("cohort_month"), (col("m") - col("cohort_month")).as("age_months"))
      .agg(
        countDistinct(col("cust")).as("n_active"),
        sum(col("rc")).as("rev_cents"))
    val wCum = Window
      .partitionBy("cohort_month")
      .orderBy("age_months")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(wCum))
      .withColumn("cohort_users", first(col("n_active")).over(wCum))
      .selectExpr(
        "cohort_month",
        "age_months",
        "n_active",
        "rev_cents",
        "cum_rev_cents",
        "cohort_users",
        exactRoundSql("cum_rev_cents", "cohort_users * 100", 10000) + " AS ltv_per_user")
  }

  /** SQL twin: identical integer cells and bounded cumulative window
    * (ages are unique within a cohort after the rollup, so the default
    * RANGE frame equals the pinned ROWS frame); the per-user division
    * uses [[exactRoundSql]]'s integer-exact rounding. */
  val cohortLtvSql: String =
    """WITH o AS (SELECT o_custkey AS cust,
                         CAST(date_part('year', o_orderdate) * 12
                              + date_part('month', o_orderdate) - 1 AS BIGINT) AS m,
                         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS rc
                  FROM orders
                  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
       u AS (SELECT cust, MIN(m) AS cohort_month FROM o GROUP BY 1),
       cs AS (SELECT cohort_month, CAST(COUNT(*) AS BIGINT) AS cohort_users
              FROM u GROUP BY 1),
       g AS (SELECT u.cohort_month, o.m - u.cohort_month AS age_months,
                    CAST(COUNT(DISTINCT o.cust) AS BIGINT) AS n_active,
                    CAST(SUM(o.rc) AS BIGINT) AS rev_cents
             FROM o JOIN u USING (cust)
             GROUP BY 1, 2),
       c AS (SELECT *, CAST(SUM(rev_cents) OVER (PARTITION BY cohort_month
                                                 ORDER BY age_months) AS BIGINT) AS cum_rev_cents
             FROM g)
       SELECT c.cohort_month, c.age_months, c.n_active, c.rev_cents, c.cum_rev_cents,
              cs.cohort_users,
              (CASE WHEN c.cum_rev_cents < 0 THEN -1.0 ELSE 1.0 END) *
                CAST((ABS(CAST(c.cum_rev_cents AS HUGEINT)) // (cs.cohort_users * 100))
                       * 10000
                     + (2 * (ABS(CAST(c.cum_rev_cents AS HUGEINT)) % (cs.cohort_users * 100))
                          * 10000 + cs.cohort_users * 100)
                       // (2 * cs.cohort_users * 100) AS DOUBLE) / 10000.0 AS ltv_per_user
       FROM c JOIN cs USING (cohort_month)
       ORDER BY cohort_month, age_months"""

  /** Per-(user, day) lag-feature materialization — the feature-store
    * shape that turns an event log into an ML training matrix: daily
    * revenue beside its previous-calendar-day value and its trailing
    * 7-calendar-day sum. Both look-backs are RANGE frames over the
    * integer epoch-day key, so absent days contribute zero by
    * construction — no dense calendar grid is ever materialized (the
    * [[gapfill]] trade: a feature row per OBSERVED day, not per
    * calendar day). Exact integer cents end to end; one user exchange
    * carries the daily rollup and both range windows (same sort).
    * Out-of-envelope values are excluded as rows ([[twap]]'s rule). */
  def features(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .events(s, dir)
      .filter(
        col("user_id").isNotNull && col("ts").isNotNull && col("value").isNotNull &&
          !isnan(col("value")) && abs(col("value")) <= 5.0e6)
      .select(
        col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("dayno"),
        cents("value").as("c"))
      // one explicit user exchange: hashpartitioning(user_id) CLUSTERS
      // (user_id, dayno) too, so the daily rollup elides its own
      // (user, day) exchange and both range windows reuse the same
      // partitioning — 1 shuffle total instead of 2 (plan-pinned)
      .repartition(col("user_id"))
      .groupBy("user_id", "dayno")
      .agg(sum(col("c")).as("dc"))
    val prev = Window.partitionBy("user_id").orderBy("dayno").rangeBetween(-1, -1)
    val week = Window.partitionBy("user_id").orderBy("dayno").rangeBetween(-6, 0)
    daily
      .select(
        col("user_id"),
        col("dayno"),
        (col("dc") / 100.0).as("revenue"),
        (coalesce(sum(col("dc")).over(prev), lit(0L)) / 100.0).as("revenue_prev_day"),
        (sum(col("dc")).over(week) / 100.0).as("revenue_7d"))
  }

  val featuresSql: String =
    """WITH e AS (
         SELECT user_id, epoch_us(ts) // 86400000000 AS dayno,
                CAST(FLOOR(value * 100) AS BIGINT) AS c
         FROM events
         WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
           AND NOT isnan(value) AND abs(value) <= 5000000),
       d AS (SELECT user_id, dayno, SUM(c) AS dc FROM e GROUP BY 1, 2)
       SELECT user_id, dayno,
              dc / 100.0 AS revenue,
              COALESCE(SUM(dc) OVER (PARTITION BY user_id ORDER BY dayno
                RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING), 0) / 100.0 AS revenue_prev_day,
              SUM(dc) OVER (PARTITION BY user_id ORDER BY dayno
                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0 AS revenue_7d
       FROM d
       ORDER BY user_id, dayno"""

  /** DAU / WAU / stickiness — the engagement census every event
    * dashboard opens with: per active day, distinct daily actives,
    * distinct trailing-7-day actives, and their ratio. The trailing
    * DISTINCT count can't ride a window frame (distinct doesn't merge),
    * so WAU(d) is computed by CONTRIBUTION: a user active on day `a` is
    * a week-active on every day in [a, a+6] — explode each (user, day)
    * activity into its 7 covered days, dedup, count. Linear with a fixed
    * ×7 expansion of the already-day-deduped frame, never a self-join
    * over the raw log; reported for OBSERVED days (a zero-DAU day has no
    * row — the dashboard's own convention). Ratio = one fixed double
    * division of two exact longs, 4-dp. */
  def activeUsers(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables
      .events(s, dir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("dayno"))
      .distinct()
    val dau = ud.groupBy("dayno").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"), explode(sequence(col("dayno"), col("dayno") + 6)).as("dayno"))
      .distinct()
      .groupBy("dayno")
      .agg(count(lit(1)).as("wau"))
    dau
      .join(wau, "dayno")
      .select(
        col("dayno"),
        col("dau"),
        col("wau"),
        round(col("dau").cast("double") / col("wau").cast("double"), 4).as("stickiness"))
  }

  val activeUsersSql: String =
    """WITH ud AS (
         SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS dayno
         FROM events
         WHERE user_id IS NOT NULL AND ts IS NOT NULL),
       dau AS (SELECT dayno, COUNT(*) AS dau FROM ud GROUP BY 1),
       cov AS (SELECT DISTINCT user_id, dayno + i AS dayno
               FROM ud, UNNEST(range(0, 7)) AS t(i)),
       wau AS (SELECT dayno, COUNT(*) AS wau FROM cov GROUP BY 1)
       SELECT dau.dayno AS dayno, dau.dau AS dau, wau.wau AS wau,
              ROUND(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE), 4) AS stickiness
       FROM dau JOIN wau ON dau.dayno = wau.dayno
       ORDER BY dayno"""

  /** Exponential moving average, EXACTLY, at ANY rational α — the
    * pandas-`ewm` staple that is normally hopeless to reproduce across
    * engines (a recursive float fold: every engine/partitioning rounds
    * differently). Two choices make it bit-stable here:
    *   - α = p/q with the 21-term truncated expansion: weights are
    *     proportional to the INTEGERS p·(q−p)^k·q^(20−k) (the dyadic
    *     2^(20−k) series at the default α = 1/2), so each term
    *     cents·weight is an exact integer — long-safe for dyadic α,
    *     DECIMAL(38,0) for wider q (see [[emaAlpha]]). The contract is
    *     the 21-SAMPLE truncated adjusted EMA: renormalization makes
    *     the relative weights exact at every α; at α = 1/2 the dropped
    *     tail carries < 2⁻²⁰ of the mass (indistinguishable from
    *     full-history ewm below the 4-dp round), while at small α
    *     (e.g. 1/16, tail ≈ 26%) the 21-sample horizon is a declared
    *     modeling choice, not an approximation error — the weights
    *     WITHIN the horizon are exact;
    *   - partial-window renormalization: at stream starts the missing
    *     lags drop out of BOTH numerator and denominator (the
    *     `adjust=True` convention), all in integers.
    * ema = Σ lagₖ·wtₖ / (100 · Σ_avail wtₖ) — ONE double division at
    * the end. 21 lag() expressions ride a single user-partitioned sort
    * (one WindowExec, one exchange); the oracle replays the identical
    * 21-term sum at the default α. Out-of-envelope rows are excluded as
    * rows ([[twap]]'s rule). */
  /** EMA smoothing factor α = p/q, session-tunable as the string "p/q"
    * (`spark.graft.win.emaAlpha`, default "1/2" — the driver-oracled
    * contract). The dyadic exactness argument generalizes q-adically:
    * truncated-EMA weights α(1−α)^k are proportional to the INTEGERS
    * p·(q−p)^k·q^(K−k), so the weighted mean is a ratio of two exact
    * integer sums at any rational α — no float accumulation ever. q is
    * bounded (≤ 16) so q^(K+1) stays far inside DECIMAL(38,0) even
    * after the ×cents×21-term sum. */
  private[operators] def emaAlpha(s: SparkSession): (Int, Int) = {
    val raw = s.conf.get("spark.graft.win.emaAlpha", "1/2")
    val m = "^(\\d+)/(\\d+)$".r
      .findFirstMatchIn(raw.trim)
      .getOrElse(throw new IllegalArgumentException(
        s"spark.graft.win.emaAlpha must be 'p/q' (e.g. '1/3'), got '$raw'"))
    val (p, q) = (m.group(1).toInt, m.group(2).toInt)
    require(p > 0 && q > p && q <= 16,
      s"spark.graft.win.emaAlpha needs 0 < p < q <= 16, got $p/$q")
    (p, q)
  }

  def ema(s: SparkSession, dir: String): DataFrame = {
    val (p, q) = emaAlpha(s)
    val K = 20
    val wts: Seq[BigInt] = (0 to K).map(k => BigInt(p) * BigInt(q - p).pow(k) * BigInt(q).pow(K - k))
    // α=1/2 (the default) keeps the round-8 LONG plan bit-identically:
    // weights 2^(20-k), Σ|c|·wt ≤ 21·5e8·2^20 < 2^63. Wider q's weights
    // pass 2^63, so those accumulate in DECIMAL(38,0): c ≤ 5e8 is
    // decimal(10,0), wt ≤ 16^21 < 2e25 is decimal(26,0), each product
    // decimal(37,0) — exact integers end to end either way, and the
    // final cast-to-double of the same integer is the same double.
    val longSafe = wts.max * 21 * BigInt(500000000L) < BigInt(Long.MaxValue)
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val base = Tables
      .events(s, dir)
      .filter(
        col("user_id").isNotNull && col("ts").isNotNull && col("value").isNotNull &&
          !isnan(col("value")) && abs(col("value")) <= 5.0e6)
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id"),
        cents("value").as("c"))
    val (num, den) =
      if (longSafe) {
        val terms = (0 to K).map(k => (lag(col("c"), k).over(w), wts(k).toLong))
        (terms.map { case (l, wt) => when(l.isNotNull, l * wt).otherwise(lit(0L)) }.reduce(_ + _),
          terms.map { case (l, wt) => when(l.isNotNull, lit(wt)).otherwise(lit(0L)) }.reduce(_ + _))
      } else {
        val zero = lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")
        val terms = (0 to K).map { k =>
          (lag(col("c"), k).over(w), lit(new java.math.BigDecimal(wts(k).bigInteger)))
        }
        (terms.map { case (l, wt) =>
          when(l.isNotNull, l.cast("decimal(10,0)") * wt).otherwise(zero)
        }.reduce(_ + _),
          terms.map { case (l, wt) => when(l.isNotNull, wt).otherwise(zero) }.reduce(_ + _))
      }
    base
      .select(
        col("user_id"),
        col("ts_us"),
        col("event_id"),
        (col("c") / 100.0).as("value"),
        round(num.cast("double") / (lit(100.0) * den.cast("double")), 4).as("ema"))
  }

  val emaSql: String = {
    val num = (0 to 20)
      .map(k => s"CASE WHEN lag(c, $k) OVER w IS NOT NULL THEN lag(c, $k) OVER w * ${1L << (20 - k)} ELSE 0 END")
      .mkString(" + ")
    val den = (0 to 20)
      .map(k => s"CASE WHEN lag(c, $k) OVER w IS NOT NULL THEN ${1L << (20 - k)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH e AS (
         SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                CAST(FLOOR(value * 100) AS BIGINT) AS c
         FROM events
         WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
           AND NOT isnan(value) AND abs(value) <= 5000000)
       SELECT user_id, ts_us, event_id, c / 100.0 AS value,
              ROUND(CAST($num AS DOUBLE) / (100.0 * CAST($den AS DOUBLE)), 4) AS ema
       FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
       ORDER BY user_id, ts_us, event_id"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_paths" -> (paths _),
    "join_interval_dim" -> (intervalDim _),
    "json_extract_agg" -> (jsonExtract _),
    "win_ema" -> (ema _),
    "ts_features" -> (features _),
    "ts_active_users" -> (activeUsers _),
    "ts_twap" -> (twap _),
    "ts_trend" -> (trend _),
    "ts_changepoint" -> (changepoint _),
    "win_cohort_ltv" -> (cohortLtv _),
    "ts_autocorr" -> (autocorr _),
    "win_rfm" -> (rfm _),
    "win_rolling_median" -> (rollingMedian _),
    "win_seasonality" -> (seasonality _),
    "win_conversion_time" -> (conversionTime _),
    "win_anomaly" -> (anomaly _),
    "ts_gapfill" -> (gapfill _),
    "ts_interpolate" -> (interpolate _),
    "ts_ohlc" -> (ohlc _),
    "win_retention" -> (retention _),
    "win_funnel" -> (funnel _),
    "win_ntile" -> (ntileQuartiles _),
    "win_range_frame" -> (rangeFrame _),
    "range_join" -> (rangeJoin _),
    "win_hourly" -> (hourly _),
    "win_moving_avg" -> (movingAvg _),
    "win_sessionize" -> (sessionize _),
    "win_session_stats" -> (sessionStats _),
    "win_attribution" -> (attribution _),
    "win_streak" -> (streaks _),
    "win_topk" -> (topkPerType _),
    "win_cumsum" -> (cumsum _),
    "asof_join" -> (asofJoin _))

  val oracles: Map[String, String] = Map(
    "win_paths" -> pathsSql,
    "join_interval_dim" -> intervalDimSql,
    "json_extract_agg" -> jsonExtractSql,
    "win_ema" -> emaSql,
    "ts_features" -> featuresSql,
    "ts_active_users" -> activeUsersSql,
    "ts_twap" -> twapSql,
    "ts_trend" -> trendSql,
    "ts_changepoint" -> changepointSql,
    "win_cohort_ltv" -> cohortLtvSql,
    "ts_autocorr" -> autocorrSql,
    "win_rfm" -> rfmSql,
    "win_rolling_median" -> rollingMedianSql,
    "win_seasonality" -> seasonalitySql,
    "win_conversion_time" -> conversionTimeSql,
    "win_anomaly" -> anomalySql,
    "ts_gapfill" -> gapfillSql,
    "ts_interpolate" -> interpolateSql,
    "ts_ohlc" -> ohlcSql,
    "win_retention" -> retentionSql,
    "win_funnel" -> funnelSql,
    "win_ntile" -> ntileQuartilesSql,
    "win_range_frame" -> rangeFrameSql,
    "range_join" -> rangeJoinSql,
    "win_hourly" -> hourlySql,
    "win_moving_avg" -> movingAvgSql,
    "win_sessionize" -> sessionizeSql,
    "win_session_stats" -> sessionStatsSql,
    "win_attribution" -> attributionSql,
    "win_streak" -> streaksSql,
    "win_topk" -> topkPerTypeSql,
    "win_cumsum" -> cumsumSql,
    "asof_join" -> asofJoinSql)
}
