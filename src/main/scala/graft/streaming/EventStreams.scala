package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming renderings of the batch event operators
  * ([[graft.operators.Windows]]): same semantics, incremental execution.
  *
  * These take a *streaming* DataFrame (from `readStream` in production,
  * `MemoryStream` in tests) so the transformations are testable without an
  * external source. Batch/stream parity is asserted in `StreamingSpec`:
  * the streamed result of a bounded input must equal the batch operator's.
  *
  * Scale: watermarks bound state (late events beyond 2h are dropped);
  * session state is per-user and times out — state size tracks active
  * users, not history.
  */
object EventStreams {

  /** Tumbling 1-hour window aggregate with a 2-hour watermark — the
    * streaming twin of [[graft.operators.Windows.hourly]]. */
  def hourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("num_events"),
        (sum(floor(col("value") * 100.0).cast("long")) / 100.0).as("total_value"))
      .select(
        unix_micros(col("window.start")).as("hour_us"),
        col("event_type"),
        col("num_events"),
        col("total_value"))

  /** Streaming daily OHLC — the incremental twin of
    * [[graft.operators.Windows.ohlc]]: the same 1-day cells via a
    * tumbling window, the same metric envelope (out-of-envelope, NaN and
    * NULL values drop before aggregation — exactly the rows whose cents
    * the batch operator NULLs out and filters), and open/close as
    * MIN/MAX over (ts_us, event_id, cents) structs — the lexicographic
    * struct extremum IS the batch rank-1 row under the module's
    * (ts_us, event_id) total order, and unlike row_number it has a
    * partial-merge form, so the whole operator is one watermark-bounded
    * streaming aggregate (state per live (day, type) cell: two structs +
    * three longs — fixed, evicted as the watermark passes the day). */
  def ohlc(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .filter(abs(col("value")) <= lit(5.0e6))
      .select(
        col("ts"),
        col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id"),
        floor(col("value") * 100.0).cast("long").as("cents"))
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        min(struct(col("ts_us"), col("event_id"), col("cents"))).as("o"),
        max(col("cents")).as("hi"),
        min(col("cents")).as("lo"),
        max(struct(col("ts_us"), col("event_id"), col("cents"))).as("c"),
        sum(col("cents")).as("s"))
      .select(
        unix_micros(col("window.start")).as("day_us"),
        col("event_type"),
        col("n_events"),
        (col("o.cents") / 100.0).as("open"),
        (col("hi") / 100.0).as("high"),
        (col("lo") / 100.0).as("low"),
        (col("c.cents") / 100.0).as("close"),
        (col("s") / 100.0).as("total_value"))

  /** Streaming exact dedup — the incremental twin of
    * [[graft.operators.Dedup.exact]]: drop any document whose content hash
    * was already seen within the watermark horizon
    * (`dropDuplicatesWithinWatermark`: state is evicted once the hash is
    * older than the watermark, so state size tracks the horizon, not the
    * stream's history — the property that makes streaming dedup viable on
    * an unbounded corpus). */
  def dedupExact(docs: DataFrame): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming Bloom-gated exact admission (22nd twin) — the online twin
    * of [[graft.operators.CorpusOps.dedupIncrementalBloom]]: each
    * arriving document is admitted against the established corpus with
    * the [[graft.operators.BloomStore]]'s filter bytes compiled into the
    * plan as a LITERAL (the frozen-static-side discipline of
    * assignClusters/embedding drift — the bits ride the task binary, no
    * join, no state):
    *
    *   - intra-stream exact dups: `dropDuplicatesWithinWatermark` on the
    *     content hash (first arrival wins = the batch lowest-id keeper
    *     on ordered replay); a NULL text gets a per-doc sentinel hash so
    *     it can never dedup against another NULL text — the batch rule
    *     (NULL-hash equality never fires) reproduced exactly.
    *   - vs corpus, bloom-NEGATIVE rows: admitted at scan speed with
    *     ZERO join — the sketch's no-false-negative guarantee makes the
    *     gate exact for them, the overwhelmingly-common case on a fresh
    *     crawl.
    *   - vs corpus, bloom-POSITIVE rows (true dups + ~fpp stragglers):
    *     stream-static LEFT ANTI against the corpus hash frame —
    *     stateless; the static side is the join's build artifact, never
    *     stream state. Self-union of the two branches is append-mode
    *     legal (one source, two filters).
    *
    * Between crawls the filter absorbs the admitted batch
    * ([[graft.operators.BloomStore.absorb]], a bit-OR) — the store
    * maintenance loop the batch operator documents, unchanged here.
    * Two-chunk ordered-replay row parity with the batch operator is
    * spec-pinned. */
  def admitBloom(
      docs: DataFrame,
      filterBytes: Array[Byte],
      corpusHashes: DataFrame): DataFrame = {
    val deduped = docs
      .withColumn(
        "content_hash",
        coalesce(md5(col("text")), concat(lit("\u0000null:"), col("doc_id").cast("string"))))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("content_hash")
      .withColumn(
        "maybe",
        call_function("graft_bloom_contains", lit(filterBytes), xxhash64(col("text"))))
    val negatives = deduped.filter(!col("maybe"))
    val positives = deduped
      .filter(col("maybe"))
      .join(
        corpusHashes.withColumnRenamed("h", "content_hash"),
        Seq("content_hash"),
        "left_anti")
    negatives
      .unionByName(positives)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  /** A streaming media asset: the crawl-ingest grain — binary payload +
    * claimed format + event time. */
  case class MediaEv(doc_id: Long, format: String, payload: Array[Byte], ts: Timestamp)

  /** Streaming media admission (27th twin) — the crawl-ingest gate for
    * ARRIVING MEDIA, [[admitBloom]]'s discipline at the asset grain:
    *
    *   - '''decode-or-quarantine''': each asset decodes through the
    *     SHARED batched [[graft.operators.Multimodal.MediaDecoder]]
    *     (real container parse; the batch/stream parity is structural —
    *     one codec, two drivers). A payload the codec rejects is DROPPED
    *     inside its batch, never fatal — the batch decoder's lenient
    *     quarantine contract, unchanged; quarantined counts read as
    *     input − output.
    *   - '''intra-stream exact dedup''' on the DECODED content hash
    *     (same raster in different containers collides — mm_dedup's
    *     property) via `dropDuplicatesWithinWatermark`; first arrival
    *     wins = the batch min-doc_id keeper on ordered replay.
    *   - '''vs the established media corpus''': the frozen BloomStore
    *     bits over corpus content hashes ride the plan as a LITERAL;
    *     bloom-negative assets admit at scan speed with zero join,
    *     positives fall back to a stateless stream-static LEFT ANTI
    *     against the corpus hash frame — admitBloom's two-branch shape
    *     verbatim.
    *
    * Two-chunk ordered-replay parity with batch
    * [[graft.operators.Multimodal.mediaDedup]]'s keeper set is
    * spec-pinned (StreamingSpec). */
  def admitMedia(
      assets: DataFrame,
      filterBytes: Array[Byte],
      corpusHashes: DataFrame): DataFrame = {
    import assets.sparkSession.implicits._
    import graft.operators.Multimodal.{MediaDecoder, MediaIn}
    val decoded = assets
      .as[MediaEv]
      .mapPartitions { it =>
        it.grouped(32).flatMap { batch =>
          // key the decode by the asset's POSITION in its batch, not by
          // doc_id: a crawl can redeliver one doc_id with different
          // payloads inside one group, and a doc_id-keyed map would
          // attribute a single decode result (or a corrupt neighbor's
          // quarantine) to both rows — position is unique by
          // construction, so each row gets exactly its own payload's
          // features (the batch decoder's per-asset semantics)
          val feats = MediaDecoder
            .decodeBatch(batch.zipWithIndex.map { case (m, i) =>
              MediaIn(i.toLong, m.format, m.payload)
            })
            .map(f => f.doc_id.toInt -> f)
            .toMap
          batch.zipWithIndex.flatMap { case (m, i) =>
            feats.get(i).map(f =>
              (m.doc_id, f.format, f.width, f.height, f.content_hash, m.ts))
          }
        }
      }
      .toDF("doc_id", "format", "width", "height", "content_hash", "ts")
    val deduped = decoded
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("content_hash")
      .withColumn(
        "maybe",
        call_function("graft_bloom_contains", lit(filterBytes), xxhash64(col("content_hash"))))
    val negatives = deduped.filter(!col("maybe"))
    val positives = deduped
      .filter(col("maybe"))
      .join(
        corpusHashes.withColumnRenamed("h", "content_hash"),
        Seq("content_hash"),
        "left_anti")
    negatives
      .unionByName(positives)
      .select(col("doc_id"), col("format"), col("width"), col("height"), col("content_hash"))
  }

  /** Streaming heavy hitters — the incremental twin of
    * [[graft.operators.TextAnalysis.heavyHitters]]: a complete-mode word
    * census over the streamed corpus, re-ranked every trigger. State is
    * the per-word count map — bounded by VOCABULARY size (Zipfian:
    * grows ~√corpus, not linearly with stream length) and each trigger's
    * update touches only the words that arrived. Sort + limit is legal
    * under complete output mode, and the pipeline IS the batch one —
    * [[graft.operators.TextAnalysis.wordCensus]] applied to the stream,
    * the shared-code parity discipline [[driftMonitor]] set — so on a
    * full replay the final table is row-identical to batch (spec-pinned).
    * The live "what's trending in this crawl" counter beside
    * [[driftMonitor]]'s language census. */
  def heavyHitters(docs: DataFrame): DataFrame =
    graft.operators.TextAnalysis.wordCensus(docs)

  /** Streaming skew monitor (21st twin) — the incremental half of
    * [[graft.operators.Analytics.skewProbe]]'s per-key census on the
    * live event stream: per-user event counts in complete mode, state =
    * ONE long per key (bounded by the active key space, not stream
    * length; each trigger touches only the keys that arrived). Spark
    * cannot run the census's second aggregation level in the same
    * streaming query (multiple stateful aggregations are unsupported),
    * so the derived stats — heavy keys, salt factor — are bounded-frame
    * arithmetic the sink applies per trigger via
    * [[graft.operators.Analytics.keyCensus]], the SAME code path batch
    * uses (the [[heavyHitters]]/wordCensus shared-code discipline;
    * replay parity spec-pinned). The operational loop this closes: the
    * batch probe chooses a salting strategy, the monitor watches the
    * live key distribution drift away from it. */
  def keyCounts(events: DataFrame): DataFrame =
    events.groupBy(col("user_id")).agg(count(lit(1)).as("c"))

  /** Streaming RFM census (25th twin) — the incremental half of
    * [[graft.operators.Windows.rfm]] on a live order stream: per-customer
    * (max recency day, order count, cents sum) in complete mode. All
    * three accumulators are associative, so state is THREE longs per
    * customer — bounded by the active customer space, not stream length;
    * each trigger touches only the customers whose orders arrived.
    * Quartile scoring is a SECOND aggregation level (rank over the
    * census), which Spark cannot run in the same streaming query
    * (multiple stateful aggregations are unsupported) — the sink applies
    * [[graft.operators.Windows.rfmScores]] to the bounded census table
    * per trigger, the SAME code path batch uses (the [[keyCounts]]/
    * keyCensus and [[heavyHitters]]/wordCensus shared-code discipline;
    * two-chunk replay parity spec-pinned). The operational loop: batch
    * RFM segments the book monthly, the monitor watches customers drift
    * between segments live. */
  def rfmCensus(orders: DataFrame): DataFrame =
    graft.operators.Windows.rfmBase(orders)

  /** Streaming cohort-LTV census (26th twin) — the incremental half of
    * [[graft.operators.Windows.cohortLtv]]: per-(customer, month)
    * revenue sums in complete mode, state = one long per active
    * (customer, month) pair — the FINEST associative census from which
    * every cohort quantity derives. Cohort assignment (min month per
    * customer) is itself an aggregation, and the cell rollup +
    * cumulative window are two more levels — none of which streaming
    * can stack in one query — so the sink applies
    * [[graft.operators.Windows.cohortLtvScores]] to the bounded census
    * per trigger (SAME code as batch; two-chunk replay parity
    * spec-pinned). The live question this answers: how is THIS month's
    * acquisition cohort monetizing while the month is still running? */
  def cohortCensus(orders: DataFrame): DataFrame =
    graft.operators.Windows.custMonthCensus(orders)

  /** Stream-stream interval join — the incremental twin of
    * [[graft.operators.Windows.rangeJoin]]: pair each event with same-user
    * events up to 5 minutes later. Watermarks on BOTH sides plus the time
    * bound in the join condition are what let Spark evict join state: a
    * buffered left row can stop waiting once the right watermark passes
    * `ts + 5 min`. Without the bound, stream-stream join state grows
    * forever — the condition is load-bearing, not a filter. */
  def rangeJoin(left: DataFrame, right: DataFrame): DataFrame =
    left
      .selectExpr("user_id AS user_a", "event_id AS id_a", "ts AS ts_a")
      .withWatermark("ts_a", "1 hour")
      .join(
        right
          .selectExpr("user_id AS user_b", "event_id AS id_b", "ts AS ts_b")
          .withWatermark("ts_b", "1 hour"),
        expr("""user_a = user_b AND id_a != id_b AND
                ts_b >= ts_a AND ts_b <= ts_a + interval 5 minutes"""))
      .select(
        col("user_a").as("user_id"),
        col("id_a"),
        col("id_b"),
        (unix_micros(col("ts_b")) - unix_micros(col("ts_a"))).as("gap_us"))

  case class AdmitIn(
      doc_id: Long,
      lang: String,
      source: String,
      n_chars: Long,
      na: Int,
      ds: Option[Seq[Long]])
  case class Admitted(doc_id: Long, lang: String, source: String, n_chars: Long)

  /** Streaming incremental admission — the online twin of
    * [[graft.operators.CorpusOps.dedupIncrementalIndexed]]: each arriving
    * document is admitted as a SINGLETON batch against the frozen
    * [[graft.operators.GramIndex]] of the established corpus.
    *
    *   - exact, intra-stream: `dropDuplicatesWithinWatermark` on the
    *     content hash — state evicts with the 2 h watermark, so memory
    *     tracks the horizon, not stream history (first arrival wins;
    *     replaying in doc_id order reproduces the batch keeper rule).
    *   - exact, vs corpus: stream-static LEFT ANTI against the index's
    *     hash set — stateless, the static side is the join's build/probe
    *     artifact, never stream state.
    *   - near, vs corpus: grams explode and LEFT OUTER join the index's
    *     rare rows (corpus df ∈ [1, 19]: the arriving doc adds one
    *     occurrence, so total df ∈ [2, 20] — exactly the batch rarity
    *     band for a singleton delta), then one stateless
    *     `flatMapGroupsWithState` pass per doc computes Jaccard against
    *     every matched corpus doc from the index's packed member lists
    *     (work per doc ≤ 20 members × its gram count) and suppresses the
    *     doc on any match ≥ 0.5 — the corpus always wins, as in batch.
    *
    * The deliberate semantic gap vs the batch operator: near-duplicates
    * BETWEEN stream documents are not detected online (that needs
    * cross-doc gram state proportional to the stream); the standard
    * lambda answer is this operator for admission latency plus the batch
    * [[graft.operators.CorpusOps.dedupIncremental]] at the next index
    * rebuild. On fixtures without intra-batch near-dup pairs the two are
    * row-identical — parity is spec-pinned.
    *
    * `docs` is streaming with (doc_id, text, source, lang, n_chars, ts);
    * `corpusHashes` / `gramIndex` are the static frames of
    * [[graft.operators.GramIndex.hashes]] / `.grams`. */
  def admitIncremental(
      docs: DataFrame,
      corpusHashes: DataFrame,
      gramIndex: DataFrame): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    val deduped = docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("content_hash")
      .join(
        corpusHashes.withColumnRenamed("h", "content_hash"),
        Seq("content_hash"),
        "left_anti")
    val rare = gramIndex.filter(col("df").between(1, 19)).select(col("gram"), col("ds"))
    val exploded = deduped
      .withColumn("garr", call_function("graft_grams", col("text")))
      .withColumn("na", coalesce(size(col("garr")), lit(0)))
      .select(
        col("doc_id"), col("lang"), col("source"), col("n_chars"), col("na"),
        // explode_outer: a doc with < 3 words has no shingles and must
        // still reach the verdict stage (it survives the near check)
        explode_outer(col("garr")).as("gram"))
      .join(rare, Seq("gram"), "left_outer")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("na"), col("ds"))
      .as[AdmitIn]
    exploded
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[AdmitIn], _: GroupState[Boolean]) => {
          val rs = rows.toArray
          val head = rs.head
          // per matched corpus doc: shared-gram count + its gram count,
          // decoded from the index packing dn = cdoc·2²¹ + n_grams·2
          val inter = scala.collection.mutable.HashMap.empty[Long, (Int, Long)]
          for (r <- rs; dsArr <- r.ds; dn <- dsArr) {
            val cdoc = dn >>> 21
            val nb = (dn >>> 1) & 1048575L
            val cur = inter.getOrElse(cdoc, (0, nb))
            inter.update(cdoc, (cur._1 + 1, nb))
          }
          val nearDup = inter.valuesIterator.exists { case (n, nb) =>
            n.toDouble / (head.na + nb - n) >= 0.5
          }
          if (nearDup) Iterator.empty
          else Iterator(Admitted(head.doc_id, head.lang, head.source, head.n_chars))
        })
  }

  case class ContamIn(
      doc_id: Long,
      lang: String,
      source: Option[String],
      n_chars: Long,
      eval_doc: Option[Long],
      n_eval: Option[Int],
      gram: Option[Long])
  case class Clean(doc_id: Long, lang: String, source: Option[String], n_chars: Long)

  /** Streaming decontamination — the online twin of
    * [[graft.operators.CorpusOps.contamination]]'s drop decision: suppress
    * each arriving training document that CONTAINS any eval document
    * (distinct-gram containment ≥ 0.5, the batch threshold). The filter a
    * training pipeline puts in front of its ingest stream so benchmark
    * text never lands in the corpus at all.
    *
    * Stateless by construction: the eval side is a BOUNDED static frame
    * (an eval benchmark is MBs — `(gram, eval_doc, n_eval)` rows, exactly
    * the batch operator's broadcast side), the stream-static left join
    * adds no state, and the per-doc verdict folds over the doc's own
    * exploded rows (all emitted by one input row, hence one trigger) with
    * a per-eval-doc distinct-gram set bounded by the eval doc's size. No
    * watermark needed — nothing outlives its trigger; the GroupState is a
    * required-but-unused slot, as in [[admitIncremental]].
    *
    * Same singleton contract as [[admitIncremental]]: each doc_id appears
    * once on the stream (a replayed doc would be re-judged and re-emitted;
    * front with [[dedupExact]] when the stream can repeat). */
  def decontaminate(docs: DataFrame, evalGrams: DataFrame): Dataset[Clean] = {
    import docs.sparkSession.implicits._
    // broadcast by hint, not by measurement: each micro-batch is planned
    // without AQE (stateful workloads disable it), and letting the
    // planner shuffle the stream against a frame that is MBs by contract
    // would put an exchange in every trigger
    val exploded = docs
      .withColumn("gram", explode_outer(call_function("graft_grams", col("text"))))
      .join(broadcast(evalGrams), Seq("gram"), "left_outer")
      .select(
        col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("eval_doc"), col("n_eval"), col("gram"))
      .as[ContamIn]
    exploded
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[ContamIn], _: GroupState[Boolean]) => {
          val rs = rows.toArray
          val head = rs.head
          // per eval doc: the distinct matched grams (graft_grams already
          // emits a distinct set per doc; the HashSet also absorbs the
          // join fan-out when one gram hits several eval docs)
          val matched =
            scala.collection.mutable.HashMap.empty[Long, (scala.collection.mutable.HashSet[Long], Int)]
          for (r <- rs; ed <- r.eval_doc; g <- r.gram; ne <- r.n_eval)
            matched.getOrElseUpdate(ed, (scala.collection.mutable.HashSet.empty[Long], ne))._1 += g
          val contaminated = matched.valuesIterator.exists {
            case (gs, ne) => gs.size.toDouble / ne >= 0.5
          }
          if (contaminated) Iterator.empty
          else Iterator(Clean(head.doc_id, head.lang, head.source, head.n_chars))
        })
  }

  case class Ev(event_id: Long, user_id: Long, ts: Timestamp, value: Double)
  case class AnomOut(event_id: Long, user_id: Long, ts_us: Long, value: Double, z: Double)

  /** Streaming z-score anomaly detection — the incremental twin of
    * [[graft.operators.Windows.anomaly]]: flag each event > 3σ from the
    * mean of the SAME user's previous ≤ 20 events. State is a per-user
    * ring of the last 20 integer cents — 160 bytes per active user, fixed
    * forever, the bounded-custom-state case flatMapGroupsWithState exists
    * for. Arithmetic mirrors the batch operator op-for-op (integer
    * moments, the same IEEE expression, the same HALF_UP 4-dp rounding),
    * so on an ordered replay the streamed flags are row-identical —
    * spec-pinned. Same ordering contract as [[sessionize]]: events arrive
    * in event-time order per user (tests feed sorted input; production
    * fronts this with a watermark + sort within trigger).
    *
    * Mirrors the batch metric-envelope guard: \|value\| > 5·10⁶ (or NaN)
    * is "no observation" — it occupies its ring slot (the batch ROWS
    * frame counts the row, not the value) as a sentinel that the
    * moments skip, exactly as the batch count/sum skip NULL cents. */
  def anomalies(events: Dataset[Ev]): Dataset[AnomOut] = {
    import events.sparkSession.implicits._
    // sentinel for an out-of-envelope row: cannot collide with valid
    // cents, which the envelope bounds to |c| ≤ 5e8
    val Missing = Long.MinValue
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Ev], state: GroupState[List[Long]]) => {
          def micros(t: Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          var ring = state.getOption.getOrElse(Nil) // oldest first, ≤ 20 row slots
          val out = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)).flatMap { e =>
            val cOpt =
              if (math.abs(e.value) <= 5.0e6) Some(math.floor(e.value * 100.0).toLong)
              else None // NaN compares false → Missing, like the batch guard
            val valid = ring.filter(_ != Missing)
            val n = valid.size
            val res = cOpt.flatMap { c =>
              if (n >= 10) {
                val s = valid.sum
                val s2 = valid.iterator.map(x => x * x).sum
                val mean = s.toDouble / n
                val vari = (s2 - s.toDouble * s / n) / n
                if (vari > 0 && math.abs(c - mean) > 3 * math.sqrt(vari)) {
                  val z = BigDecimal((c - mean) / math.sqrt(vari))
                    .setScale(4, BigDecimal.RoundingMode.HALF_UP)
                    .toDouble
                  Some(AnomOut(e.event_id, userId, micros(e.ts), e.value, z))
                } else None
              } else None
            }
            ring = (ring :+ cOpt.getOrElse(Missing)).takeRight(20)
            res
          }
          state.update(ring)
          out.iterator
        })
  }

  /** Streaming EMA — the incremental twin of
    * [[graft.operators.Windows.ema]]: per user, a ring of the last ≤ 21
    * integer cents (168 bytes, fixed forever — [[anomalies]]' state
    * shape) replays the batch operator's 21-term dyadic expansion
    * EXACTLY: num = Σ ringₖ·2^(20−k), den = Σ_avail 2^(20−k), one double
    * division, the same HALF_UP 4-dp round — so an ordered replay is
    * row-identical to batch (spec-pinned). Out-of-envelope rows are
    * excluded as ROWS (they never touch the ring — the batch filter's
    * semantics, unlike [[anomalies]]' sentinel slots which mirror a ROWS
    * frame). Same ordered-arrival contract as the other typed twins. */
  def ema(events: Dataset[Ev]): Dataset[EmaOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Ev], state: GroupState[List[Long]]) => {
          def micros(t: Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          var ring = state.getOption.getOrElse(Nil) // newest FIRST, ≤ 21 cents
          val out = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)).flatMap { e =>
            if (!(math.abs(e.value) <= 5.0e6)) None // NaN compares false → excluded
            else {
              val c = math.floor(e.value * 100.0).toLong
              ring = (c :: ring).take(21)
              var num = 0L; var den = 0L
              for ((v, k) <- ring.iterator.zipWithIndex) {
                num += v * (1L << (20 - k)); den += 1L << (20 - k)
              }
              val ema = BigDecimal
                .valueOf(num.toDouble / (100.0 * den.toDouble))
                .setScale(4, BigDecimal.RoundingMode.HALF_UP)
                .toDouble
              Some(EmaOut(e.event_id, userId, micros(e.ts), c / 100.0, ema))
            }
          }
          state.update(ring)
          out.iterator
        })
  }

  case class EmaOut(event_id: Long, user_id: Long, ts_us: Long, value: Double, ema: Double)

  case class FeatOut(
      user_id: Long,
      dayno: Long,
      revenue: Double,
      revenue_prev_day: Double,
      revenue_7d: Double)

  /** Streaming per-(user, day) lag features — the incremental twin of
    * [[graft.operators.Windows.features]], the feature-freshness path an
    * online trainer polls: daily revenue beside its previous-calendar-day
    * value and trailing 7-calendar-day sum, updated as events arrive.
    * State per user is the ring of the last ≤ 7 OBSERVED (dayno, cents)
    * pairs — 112 bytes, fixed forever; the batch operator's two range
    * windows become map lookups over the ring.
    *
    * Emission contract (the [[streaks]] convention): a day's row is
    * emitted FINAL when a later day's first event arrives (the ring
    * still holds the day plus its ≤ 6 predecessors at that moment — the
    * exact look-back the features need); the still-open newest day is
    * re-emitted each trigger, so each (user, day)'s LAST emission equals
    * the batch row once the input is exhausted (spec-pinned parity).
    * Out-of-envelope values are excluded as ROWS (the batch filter);
    * same ordered-arrival contract as the other typed twins — an
    * out-of-contract late event folds into its day only while that day
    * is still retained, else it is dropped. */
  def features(events: Dataset[Ev]): Dataset[FeatOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Ev], state: GroupState[List[(Long, Long)]]) => {
          def micros(t: Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          var ring = state.getOption.getOrElse(Nil) // (dayno, cents) newest first, ≤ 7
          def row(d: Long): FeatOut = {
            val m = ring.toMap
            val week = ring.collect { case (dd, cc) if dd >= d - 6 && dd <= d => cc }.sum
            FeatOut(userId, d, m.getOrElse(d, 0L) / 100.0, m.getOrElse(d - 1, 0L) / 100.0,
              week / 100.0)
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[FeatOut]
          for (e <- evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))) {
            if (math.abs(e.value) <= 5.0e6) { // NaN compares false → excluded
              val d = Math.floorDiv(micros(e.ts), 86400000000L)
              val c = math.floor(e.value * 100.0).toLong
              ring.headOption match {
                case None => ring = List((d, c))
                case Some((cur, cc)) if d == cur => ring = (cur, cc + c) :: ring.tail
                case Some((cur, _)) if d > cur =>
                  out += row(cur) // the rolled-over day is final
                  ring = ((d, c) :: ring).take(7)
                case _ => // out-of-contract late event: fold only if retained
                  ring = ring.map { case (dd, cc) => if (dd == d) (dd, cc + c) else (dd, cc) }
              }
            }
          }
          state.update(ring)
          ring.headOption.foreach(h => out += row(h._1)) // open day, superseded next trigger
          out.iterator
        })
  }

  /** Streaming tier classification — the incremental twin of
    * [[graft.operators.Windows.intervalDim]]'s classification step: each
    * arriving event joins the SAME broadcast [lo, hi) tier frame (shared
    * code — [[graft.operators.Windows.tierFrame]] builds both sides, so
    * parity is structural) and carries its tier label downstream.
    * Stateless — a stream-static broadcast non-equi join plans a
    * per-trigger BroadcastNestedLoopJoin against the bounded dimension,
    * no state, no shuffle ([[decontaminate]]'s broadcast-by-hint rule:
    * micro-batch planning has no AQE, so the hint is load-bearing).
    * Out-of-envelope rows drop as in batch; the batch operator's rollup
    * is any downstream aggregation. */
  def classifyTiers(events: DataFrame): DataFrame = {
    val tiers = graft.operators.Windows.tierFrame(events.sparkSession)
    events
      .filter(abs(col("value")) <= lit(5.0e6))
      .select(
        col("event_id"),
        col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        floor(col("value") * 100.0).cast("long").as("c"))
      .join(broadcast(tiers), col("c") >= col("lo") && col("c") < col("hi"))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("c"), col("tier_ord"), col("tier"))
  }

  case class SessionState(sessionId: Long, lastTsUs: Long)
  case class SessionOut(event_id: Long, user_id: Long, ts_us: Long, session_id: Long)

  /** Per-user sessionization via flatMapGroupsWithState — the custom-state
    * path the lag-gap batch version can't express incrementally. Events
    * must arrive in event-time order per user (tests feed sorted input;
    * production fronts this with a watermark + sort within trigger). */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) => {
          // Timestamp.getTime is millisecond-precision; reconstruct the
          // full microsecond value from getNanos or parity with the batch
          // operator's unix_micros breaks
          def micros(t: Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          val out = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)).map { e =>
            val tsUs = micros(e.ts)
            val gap = tsUs - st.lastTsUs
            val sid =
              if (st.lastTsUs == Long.MinValue) st.sessionId
              else if (gap > 1800000000L) st.sessionId + 1
              else st.sessionId
            st = SessionState(sid, tsUs)
            SessionOut(e.event_id, userId, tsUs, sid)
          }
          state.update(st)
          out.iterator
        })
  }

  case class AsofIn(user_id: Long, t_us: Long, event_id: Option[Long], o_orderkey: Option[Long])
  case class AsofState(tUs: Long, orderkey: Long)
  case class AsofOut(event_id: Long, user_id: Long, ts_us: Long, matched_orderkey: Long)

  /** Streaming ASOF enrichment (31st twin, r16 verdict #6) — the online
    * half of [[graft.operators.Windows.asofJoin]]: a merged tagged
    * stream of order rows and event rows (the batch union+window trick
    * made incremental — one FEED, time-ordered per user, exactly how a
    * CDC/event bus delivers both), where each arriving EVENT is enriched
    * with the user's latest order at-or-before its timestamp. This is
    * the lookup-enrichment shape a live pipeline runs constantly:
    * state = ONE (t_us, orderkey) pair per user — the running
    * `last_value(ignore nulls)` of the batch window — ~24 bytes/user
    * forever, no buffering of events, no pairwise join state.
    *
    * Semantics mirror batch bit-for-bit: an arriving order REPLACES the
    * state iff it is (t_us, orderkey)-lexicographically later (so the
    * deduped-to-max-orderkey order feed reproduces the batch groupBy,
    * and an undeduped feed converges to the same state anyway); within
    * one trigger chunk, rows replay in (t_us, order-before-event,
    * event_id) order — the batch window's sort, so an order dated
    * exactly at an event's timestamp is visible to it (>= match). An
    * event with no order yet emits nothing (batch: matched_orderkey
    * NULL rows are filtered). Ordered two-chunk replay is row-identical
    * to the batch operator (spec-pinned): every event's emission is
    * final the moment it fires — Append semantics, never revised. */
  def asofEnrich(rows: Dataset[AsofIn]): Dataset[AsofOut] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, it: Iterator[AsofIn], state: GroupState[AsofState]) => {
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[AsofOut]
          val ordered = it.toSeq.sortBy(r =>
            (r.t_us, r.o_orderkey.isEmpty, r.event_id.getOrElse(0L)))
          for (r <- ordered) r.o_orderkey match {
            case Some(k) =>
              if (st == null || r.t_us > st.tUs || (r.t_us == st.tUs && k > st.orderkey))
                st = AsofState(r.t_us, k)
            case None =>
              if (st != null)
                out += AsofOut(r.event_id.getOrElse(
                  throw new IllegalArgumentException(
                    s"asofEnrich: tagged row for user $userId has neither event_id nor o_orderkey")),
                  userId, r.t_us, st.orderkey)
          }
          if (st != null) state.update(st)
          out.iterator
        })
  }

  case class StreakState(lastDay: Long, cur: Long, curStart: Long, best: Long, bestStart: Long)
  case class StreakOut(user_id: Long, best_streak: Long, start_day: Long)

  case class PathEv(event_id: Long, user_id: Long, ts: Timestamp, event_type: String)
  case class PathState(t1: String, t2: String)
  case class PathOut(e1: String, e2: String, e3: String)

  case class ConvState(vTs: Long, lastPreViewPurchase: Long, emitted: Boolean)
  case class ConvOut(user_id: Long, lat_s: Long)

  case class TwapState(prevTs: Long, prevC: Long, nObs: Long, totalS: Long, acc: String)
  case class TwapOut(user_id: Long, n_obs: Long, total_s: Long, twap: Double)

  /** Streaming TWAP — the incremental twin of
    * [[graft.operators.Windows.twap]]: per-user time-weighted average,
    * each observation weighted by the exact integer seconds until the
    * user's NEXT valid observation. The batch LEAD window becomes one
    * subtraction against the carried previous observation: state is
    * (prev ts µs, prev cents, n_obs, total_s, Σ c·dt as a decimal
    * string — the accumulator the batch side holds in DECIMAL(38,0),
    * kept exact here as a BigInt since a long could overflow on
    * extreme-value multi-year streams). ~80 bytes/user forever.
    *
    * Arithmetic mirrors batch op-for-op: µs DIV 10⁶ integer weights,
    * integer cents, ONE division at the end on identically-derived
    * doubles, the same HALF_UP 4-dp round — so the final per-user
    * emission is row-identical to the batch operator (spec-pinned).
    * Emission follows the [[streaks]] convention: the group's current
    * aggregate emits once per trigger (total_s > 0 gate = batch's
    * HAVING), the test reads each user's LAST emission. Out-of-envelope
    * rows (NULL/NaN/|v| > 5·10⁶) are excluded as ROWS, so the previous
    * valid observation's interval spans across them — batch's rule. */
  def twap(events: Dataset[Ev]): Dataset[TwapOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Ev], state: GroupState[TwapState]) => {
          def micros(t: Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          var st = state.getOption.getOrElse(TwapState(Long.MinValue, 0L, 0L, 0L, "0"))
          var acc = BigInt(st.acc)
          val live = evs
            .filter(e => e.ts != null && !e.value.isNaN && math.abs(e.value) <= 5.0e6)
            .toSeq
          for (e <- live.sortBy(e => (micros(e.ts), e.event_id))) {
            val t = micros(e.ts)
            val c = math.floor(e.value * 100.0).toLong
            if (st.prevTs != Long.MinValue) {
              val dt = Math.floorDiv(t - st.prevTs, 1000000L)
              acc += BigInt(st.prevC) * BigInt(dt)
              st = st.copy(nObs = st.nObs + 1, totalS = st.totalS + dt)
            }
            st = st.copy(prevTs = t, prevC = c)
          }
          state.update(st.copy(acc = acc.toString))
          if (st.totalS > 0) {
            val tw = BigDecimal
              .valueOf(acc.toDouble / (100.0 * st.totalS.toDouble))
              .setScale(4, BigDecimal.RoundingMode.HALF_UP)
              .toDouble
            Iterator(TwapOut(userId, st.nObs, st.totalS, tw))
          } else Iterator.empty
        })
  }

  case class AcfLagState(m: Long, sx: String, sy: String, sxy: String, sxx: String, syy: String)
  case class AcfState(nObs: Long, ring: Seq[Long], lag1: AcfLagState, lag7: AcfLagState)
  case class AcfOut(
    user_id: Long,
    n_obs: Long,
    acf_lag1: Option[Double],
    acf_lag7: Option[Double])

  /** Streaming lag-1/lag-7 autocorrelation (24th twin) — the incremental
    * twin of [[graft.operators.Windows.autocorr]]: the batch leads
    * become ring lookbacks (the [[features]] move), so a pair
    * (y_t, y_{t+k}) completes exactly when observation t+k arrives and
    * the k-back ring slot supplies y_t. State = ring of the last ≤ 7
    * cents + the twelve pair sums as exact BigInt strings (the [[twap]]
    * accumulator convention) — ~300 bytes/user forever.
    *
    * Arithmetic mirrors batch op-for-op: the sums are the SAME
    * NULL-skipping pair sums the batch aggregate folds (ordered arrival
    * ⇒ identical pairing), and the final r is the same fixed float
    * expression over identically-derived doubles (BigInt.toDouble =
    * DECIMAL(38,0)→DOUBLE, round-to-nearest) with the same HALF_UP 4-dp
    * round and the same m ≥ 2 / positive-variance NULL guards — each
    * user's last emission row-identical to batch (spec-pinned). */
  def autocorr(events: Dataset[Ev]): Dataset[AcfOut] = {
    import events.sparkSession.implicits._
    val zero = AcfLagState(0L, "0", "0", "0", "0", "0")
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Ev], state: GroupState[AcfState]) => {
          var st = state.getOption.getOrElse(AcfState(0L, Seq.empty, zero, zero))
          var ring = st.ring.toVector
          var nObs = st.nObs
          def fold(l: AcfLagState, x: Long, y: Long): AcfLagState =
            AcfLagState(
              l.m + 1,
              (BigInt(l.sx) + x).toString,
              (BigInt(l.sy) + y).toString,
              (BigInt(l.sxy) + BigInt(x) * y).toString,
              (BigInt(l.sxx) + BigInt(x) * x).toString,
              (BigInt(l.syy) + BigInt(y) * y).toString)
          var (l1, l7) = (st.lag1, st.lag7)
          for (
            e <- evs.filter(e => e.ts != null && !e.value.isNaN && math.abs(e.value) <= 5.0e6)
          ) {
            val c = math.floor(e.value * 100.0).toLong
            if (ring.nonEmpty) l1 = fold(l1, ring.last, c)
            if (ring.length >= 7) l7 = fold(l7, ring(ring.length - 7), c)
            ring = (ring :+ c).takeRight(7)
            nObs += 1
          }
          state.update(AcfState(nObs, ring, l1, l7))
          def r(l: AcfLagState): Option[Double] = {
            val (m, sx, sy) = (l.m.toDouble, BigInt(l.sx).toDouble, BigInt(l.sy).toDouble)
            val (sxy, sxx, syy) =
              (BigInt(l.sxy).toDouble, BigInt(l.sxx).toDouble, BigInt(l.syy).toDouble)
            val vx = m * sxx - sx * sx
            val vy = m * syy - sy * sy
            if (l.m >= 2 && vx > 0 && vy > 0)
              Some(BigDecimal
                .valueOf((m * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy)))
                .setScale(4, BigDecimal.RoundingMode.HALF_UP)
                .toDouble)
            else None
          }
          if (nObs == 0) Iterator.empty
          else Iterator(AcfOut(userId, nObs, r(l1), r(l7)))
        })
  }

  case class TrendState(n: Long, dayLast: Long, sx: String, sy: String, sxx: String, sxy: String)
  case class TrendOut(
    user_id: Long,
    n_obs: Long,
    day_last: Long,
    slope_per_day: Option[Double],
    forecast_7d: Option[Double])

  /** Streaming per-user OLS trend (23rd twin) — the incremental twin of
    * [[graft.operators.Windows.trend]], and the cleanest possible case
    * for streaming: the batch fit is FIVE associative integer sums, so
    * the state IS the sufficient statistic — (n, day_last, Σx, Σy, Σx²,
    * Σxy) — and absorbing an event is six additions. No ring buffer, no
    * ordering sensitivity at all (the sums commute, so late/shuffled
    * arrivals converge to the identical fit), ~120 bytes per user
    * forever (the wide sums ride as BigInt strings — the [[twap]]
    * accumulator convention, since Σxy can pass 2⁶³ on extreme streams).
    *
    * Arithmetic mirrors batch op-for-op: epoch-day x via floorDiv,
    * integer cents, the closed-form num/den/fc_num in exact BigInt, and
    * the batch operator's integer-exact half-away rounding (the
    * [[graft.operators.Windows]] exactRoundSql formula — same integer,
    * same single float division) — per-user emissions row-identical to
    * the batch operator on replay (spec-pinned). Emission follows the
    * [[streaks]] convention: the
    * current fit emits once per trigger, a vertical line (den = 0)
    * emits its NULL-fit row rather than vanishing — the batch rule. */
  def trend(events: Dataset[Ev]): Dataset[TrendOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Ev], state: GroupState[TrendState]) => {
          def micros(t: Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          val st = state.getOption.getOrElse(TrendState(0L, Long.MinValue, "0", "0", "0", "0"))
          var n = st.n
          var dayLast = st.dayLast
          var (sx, sy, sxx, sxy) = (BigInt(st.sx), BigInt(st.sy), BigInt(st.sxx), BigInt(st.sxy))
          for (
            e <- evs.filter(e =>
              e.ts != null && !e.value.isNaN && math.abs(e.value) <= 5.0e6 &&
                micros(e.ts) >= 0)
          ) {
            val x = Math.floorDiv(micros(e.ts), 86400000000L)
            val c = math.floor(e.value * 100.0).toLong
            n += 1
            dayLast = math.max(dayLast, x)
            sx += x; sy += c; sxx += BigInt(x) * x; sxy += BigInt(x) * c
          }
          state.update(TrendState(n, dayLast, sx.toString, sy.toString, sxx.toString, sxy.toString))
          if (n == 0) Iterator.empty
          else {
            val num = BigInt(n) * sxy - sx * sy
            val den = BigInt(n) * sxx - sx * sx
            if (den == 0) Iterator(TrendOut(userId, n, dayLast, None, None))
            else {
              // the batch operator's integer-exact half-away rounding
              // (Windows.exactRoundSql): same integer, same one division
              def hr(p: BigInt, scale: Long): Double =
                p.signum * ((p.abs * 2 * scale + den * 100) / (den * 200)).toDouble / scale
              val fcNum = sy * sxx - sx * sxy + num * BigInt(dayLast + 7)
              Iterator(
                TrendOut(userId, n, dayLast, Some(hr(num, 1000000L)), Some(hr(fcNum, 10000L))))
            }
          }
        })
  }

  /** Streaming conversion latency — the incremental twin of
    * [[graft.operators.Windows.conversionTime]]'s per-user latency
    * derivation: first `view` to first `purchase` at-or-after it, in
    * integer seconds, emitted ONCE per converting user at the moment the
    * qualifying purchase arrives. The batch operator's band rollup
    * (< 1h/1d/7d bands + exact mean) is a plain downstream aggregation;
    * the hard part under streaming is the at-or-after join, which the
    * 24-byte state solves: first-view micros, the last purchase micros
    * seen BEFORE any view, and the emitted flag.
    *
    * The pre-view purchase slot exists for exact batch parity on ties:
    * batch qualifies any purchase with ts ≥ v_ts, and under the ordered
    * arrival contract a purchase can precede the first view only with
    * ts ≤ v_ts — so a qualifying pre-view purchase means ts == v_ts
    * exactly, and carrying the LAST such ts (ascending arrival makes it
    * the max, and equality to v is all that's checked) reproduces
    * batch's min-qualifying choice without buffering purchases. Rows
    * batch pre-filters (NULL type/ts) are skipped identically; same
    * ordered-arrival contract as [[sessionize]]/[[streaks]]. */
  def conversions(events: Dataset[PathEv]): Dataset[ConvOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[PathEv], state: GroupState[ConvState]) => {
          def micros(t: Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          var st = state.getOption.getOrElse(ConvState(Long.MinValue, Long.MinValue, false))
          val out = scala.collection.mutable.ArrayBuffer.empty[ConvOut]
          val live = evs.filter(e => e.event_type != null && e.ts != null).toSeq
          for (e <- live.sortBy(e => (micros(e.ts), e.event_id))) {
            val t = micros(e.ts)
            e.event_type match {
              case "view" if st.vTs == Long.MinValue =>
                st = st.copy(vTs = t)
                if (!st.emitted && st.lastPreViewPurchase == t) {
                  out += ConvOut(userId, 0L)
                  st = st.copy(emitted = true)
                }
              case "purchase" if st.vTs == Long.MinValue =>
                st = st.copy(lastPreViewPurchase = t)
              case "purchase" if !st.emitted && t >= st.vTs =>
                out += ConvOut(userId, Math.floorDiv(t - st.vTs, 1000000L))
                st = st.copy(emitted = true)
              case _ => ()
            }
          }
          state.update(st)
          out.iterator
        })
  }

  /** Streaming activity streaks — the incremental twin of
    * [[graft.operators.Windows.streaks]]: per-user longest
    * consecutive-day run, updated as events arrive. State is FIVE longs
    * per user (last day, current run + its start, best run + its start)
    * — 40 bytes, fixed forever; the gaps-and-islands groupBy the batch
    * operator runs is replaced by a single comparison against the
    * previous day. Arithmetic mirrors batch exactly: a strictly-greater
    * update keeps the earliest start on ties, UTC epoch-day numbering is
    * the same `micros DIV 86_400_000_000`. Emits the group's current
    * best once per trigger (update semantics — the test reads each
    * user's LAST emission); same ordered-arrival contract as
    * [[sessionize]]. */
  def streaks(events: Dataset[Ev]): Dataset[StreakOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Ev], state: GroupState[StreakState]) => {
          def micros(t: Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          var st = state.getOption.getOrElse(StreakState(Long.MinValue, 0L, 0L, 0L, 0L))
          for (e <- evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))) {
            val day = Math.floorDiv(micros(e.ts), 86400000000L)
            if (st.lastDay == Long.MinValue) st = StreakState(day, 1L, day, 1L, day)
            else if (day == st.lastDay) () // same day: no change
            else {
              val (cur, curStart) =
                if (day == st.lastDay + 1) (st.cur + 1, st.curStart) else (1L, day)
              val (best, bestStart) =
                if (cur > st.best) (cur, curStart) else (st.best, st.bestStart)
              st = StreakState(day, cur, curStart, best, bestStart)
            }
          }
          state.update(st)
          if (st.lastDay == Long.MinValue) Iterator.empty
          else Iterator(StreakOut(userId, st.best, st.bestStart))
        })
  }

  /** Streaming path census feed — the incremental twin of
    * [[graft.operators.Windows.paths]]' trigram extraction: per user,
    * keep only the last TWO event types (two short strings — state is
    * fixed-size per user forever, the smallest state in this module) and
    * emit one completed (e1, e2, e3) observation per arriving event once
    * the window is full. The batch operator's census + top-10 cut is a
    * plain aggregation any consumer (or [[heavyHitters]]-style
    * complete-mode sink) applies downstream — the HARD part under
    * streaming is the cross-trigger adjacency, which is exactly what the
    * carried two-type state solves: a trigram spanning a trigger
    * boundary is assembled from state, not from reprocessing.
    *
    * Same ordered-arrival contract as [[sessionize]]/[[streaks]]
    * (in-trigger sort by (ts, event_id), cross-trigger order from the
    * source); rows the batch operator pre-filters (NULL type/ts) are
    * skipped WITHOUT disturbing the window — batch adjacency skips them
    * identically, so full-replay parity is row-exact (spec-pinned). */
  def paths(events: Dataset[PathEv]): Dataset[PathOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, evs: Iterator[PathEv], state: GroupState[PathState]) => {
          def micros(t: Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          var st = state.getOption.getOrElse(PathState(null, null))
          val out = Seq.newBuilder[PathOut]
          for (
            e <- evs.toSeq
              .filter(e => e.event_type != null && e.ts != null)
              .sortBy(e => (micros(e.ts), e.event_id))
          ) {
            if (st.t1 != null && st.t2 != null) out += PathOut(st.t1, st.t2, e.event_type)
            st = PathState(st.t2, e.event_type)
          }
          state.update(st)
          out.result().iterator
        })
  }

  /** Streaming drift monitor — the incremental twin of
    * [[graft.operators.CorpusOps.batchDrift]]: as a crawl batch streams
    * in, maintain its per-language census (one streaming aggregate,
    * complete mode — state is |langs| rows, bounded by language
    * cardinality forever) and on every trigger publish the full drift
    * report against the STATIC corpus census via `foreachBatch` — the
    * same full-outer census merge and the same arithmetic
    * ([[graft.operators.CorpusOps.driftFrom]], shared code) as the batch
    * operator, so parity is structural. The report lands in a temp view
    * (`outView`) refreshed per trigger: the "is this crawl drifting"
    * dashboard read updates while the crawl is still arriving, instead
    * of after a full-corpus batch job.
    *
    * `corpusCensus` must be the established-corpus frame
    * `(lang, corpus_docs, corpus_chars)` — tiny by construction. It is
    * collected ONCE at wiring time into a local relation: micro-batch
    * planning runs without AQE, and a lazy source-backed frame would
    * re-scan the corpus census from files on EVERY trigger (a full-outer
    * join can't broadcast either side, so there is no hint to reach
    * for — the [[decontaminate]] trick doesn't apply; materializing the
    * static side is the move that keeps the per-trigger plan
    * local-relation-sized). */
  def driftMonitor(
      docs: DataFrame,
      corpusCensus: DataFrame,
      outView: String): org.apache.spark.sql.streaming.StreamingQuery = {
    // capture the OWNING session: inside foreachBatch, batch.sparkSession
    // is the stream's cloned micro-batch session, whose temp views are
    // invisible to the caller — the view must register where the reader is
    val owner = docs.sparkSession
    val censusLocal = owner.createDataFrame(
      java.util.Arrays.asList(corpusCensus.collect(): _*),
      corpusCensus.schema)
    val census = docs
      .groupBy(coalesce(col("lang"), lit("(none)")).as("lang"))
      .agg(count(lit(1)).as("batch_docs"), sum(col("n_chars")).as("batch_chars"))
    census.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val perLang = batch
          .join(censusLocal, Seq("lang"), "full_outer")
          .select(
            col("lang"),
            coalesce(col("batch_docs"), lit(0L)).as("batch_docs"),
            coalesce(col("corpus_docs"), lit(0L)).as("corpus_docs"),
            coalesce(col("batch_chars"), lit(0L)).as("batch_chars"),
            coalesce(col("corpus_chars"), lit(0L)).as("corpus_chars"))
        // materialize the |langs|-row report BEFORE registering the view:
        // a lazy view over the micro-batch frame would recompute against
        // a batch that no longer exists once the trigger completes
        val out = graft.operators.CorpusOps.driftFrom(perLang)
        val snap = owner.createDataFrame(
          java.util.Arrays.asList(out.collect(): _*), out.schema)
        snap.createOrReplaceTempView(outView)
      }
      .start()
  }

  /** Streaming embedding drift — the incremental twin of
    * [[graft.operators.Similarity.drift]]: as vectors stream in, maintain
    * each label's `(vector sum, count)` aggregate (complete mode — state
    * is |labels| × (dim longs + 1), bounded by label cardinality forever)
    * and score every trigger against a FROZEN corpus centroid compiled in
    * as a literal at wiring time ([[assignClusters]]' static-side
    * discipline; obtain it from
    * [[graft.operators.Similarity.globalCentroid]]). Admission hygiene,
    * the biased floor-division centroid and the cosine are the batch
    * operator's own code ([[graft.operators.Similarity.gateQuantize]] /
    * `centroided` / `driftCos`) — parity is structural, and a full replay
    * is row-identical to batch (spec-pinned). The live "is this crawl's
    * embedding distribution drifting" monitor beside [[driftMonitor]]'s
    * language census. */
  def embDrift(vecs: DataFrame, globalCent: Seq[Long]): DataFrame = {
    require(globalCent.nonEmpty, "embDrift needs a non-empty corpus centroid")
    val ng = globalCent.iterator.map(x => x * x).sum
    val s = vecs.sparkSession
    graft.operators.Similarity
      .centroided(
        graft.operators.Similarity
          .gateQuantize(vecs, graft.operators.Similarity.embDim(s))
          .groupBy("label")
          .agg(
            call_function("graft_vec_sum", col("qv")).as("sv"),
            count(lit(1)).as("n_vecs")))
      .select(
        col("label"),
        col("n_vecs"),
        graft.operators.Similarity
          .driftCos(col("cent"), col("ns"), typedlit(globalCent), lit(ng))
          .as("drift_cos"))
  }

  /** Streaming cluster assignment — the online-inference twin of
    * [[graft.operators.Similarity.embKmeans]]: each arriving vector is
    * admitted under EXACTLY the batch hygiene rules
    * ([[graft.operators.Similarity.gateQuantize]], shared code) and
    * assigned by the SAME argmin distance expression
    * ([[graft.operators.Similarity.argminBest]], shared code) against a
    * FROZEN codebook, so batch/stream parity is structural, not just
    * test-pinned.
    *
    * The codebook (k centroids as integer (sum-vector, count) pairs,
    * from [[graft.operators.Similarity.kmeansCentroids]]) is compiled
    * into the plan as a LITERAL at wiring time — the driftMonitor
    * materialize-the-static-side argument taken to its limit: zero
    * joins, zero state, zero shuffles, zero static-side re-scans per
    * trigger; assignment is a narrow per-row map. Re-wire the stream to
    * pick up re-trained centroids (frozen-codebook inference is the
    * contract, as for the IVF store). Each centroid's self-dot is exact
    * driver-side Long arithmetic — the same integers the batch codebook
    * computes in-plan. */
  def assignClusters(vecs: DataFrame, centroids: Seq[(Int, Seq[Long], Long)]): DataFrame = {
    require(centroids.nonEmpty, "assignClusters needs at least one centroid")
    val cb = array(centroids.map { case (cid, sv, c) =>
      val ns = sv.iterator.map(x => x * x).sum
      struct(
        lit(cid).as("cid"),
        typedlit(sv).as("sv"),
        lit(c).as("c"),
        lit(ns).as("ns"))
    }: _*)
    graft.operators.Similarity
      .gateQuantize(vecs, graft.operators.Similarity.embDim(vecs.sparkSession))
      .withColumn("best", graft.operators.Similarity.argminBest(cb))
      .select(col("vec_id"), col("best.cid").as("cid"))
  }

  /** Streaming ANN query serving (30th twin, r15 verdict #6) — the
    * online-RETRIEVAL twin of [[graft.operators.VectorIndex.annLshIndexed]]:
    * arriving QUERY vectors are admitted under EXACTLY the batch hygiene
    * rules ([[graft.operators.Similarity.gateQuantize]], shared code),
    * probe-expanded by the SAME native `graft_lsh_probes` multi-probe
    * kernel the batch paths use (r17: 3 buckets per table), and served
    * their exact-cosine top-5 against a FROZEN vector store compiled into
    * the plan as literals at wiring time ([[assignClusters]]' frozen-model
    * discipline applied to the index itself): `buckets` maps each
    * (t·16 + b) key to its id-sorted member list (the store's lshbuckets
    * body), `vectors`/`norms` map vec_id to its quantized vector and
    * exact self-dot (the store's slim vectors body). Zero joins, zero
    * state, zero shuffles, zero static re-scans per trigger — candidate
    * lookup, exact rescoring, the (cos DESC, id ASC) comparator sort and
    * the top-5 cut are ONE narrow per-row expression, which is the honest
    * Spark rendering of what an online ANN server does: the index shard
    * is RESIDENT beside the query, never shuffled to it. At fixture/shard
    * scale the literals are bounded; at 100 TB the same per-row shape
    * runs with the store partitions resident per executor (mapPartitions
    * over the reader-pruned bodies) — re-wire to pick up a re-built
    * store, exactly the frozen-codebook contract.
    *
    * Parity is structural where it can be (admission gate, bucket
    * kernel, dot/cosine arithmetic — shared code paths produce identical
    * doubles) and spec-pinned end to end: ordered two-chunk replay of
    * the store's own query sample is row-identical to ann_lsh_idx's
    * top-5 (self-matches excluded, candidates deduped across tables,
    * ties to the lower vec_id — the family conventions). A query whose
    * buckets hold no candidates emits nothing (batch: no row survives
    * the candidate join). */
  def serveAnnLsh(
      queries: DataFrame,
      buckets: Map[Long, Seq[Long]],
      vectors: Map[Long, Seq[Long]],
      norms: Map[Long, Long]): DataFrame = {
    require(buckets.nonEmpty, "serveAnnLsh needs a frozen bucket index")
    require(vectors.nonEmpty && norms.nonEmpty, "serveAnnLsh needs the frozen vector shard")
    // literal-size guard (r16 advice): the frozen shard is compiled into
    // the PLAN — beyond fixture/shard scale that explodes plan size and
    // codegen during DRIVER planning, long before execution. Fail loudly
    // with the documented alternative instead of OOMing the driver.
    val literalCells =
      vectors.size.toLong * vectors.headOption.map(_._2.size.toLong).getOrElse(1L) +
        buckets.valuesIterator.map(_.size.toLong).sum
    require(
      literalCells <= 2000000L,
      s"serveAnnLsh: frozen shard too large for plan literals ($literalCells cells > 2e6) — " +
        "serve this shard via mapPartitions over the reader-pruned store bodies instead " +
        "(the scaladoc's 100 TB shape)")
    val s = queries.sparkSession
    val bmap = typedlit(buckets)
    val vmap = typedlit(vectors)
    val nmap = typedlit(norms)
    val per = lit(graft.functions.LshProbes.PerTable)
    graft.operators.Similarity
      .gateQuantize(queries, graft.operators.Similarity.embDim(s))
      .select(col("vec_id").as("query_id"), col("qv"), col("nq"))
      // MULTI-PROBE serving (parity with the batch lshProbePairs): the
      // kernel's array position encodes the table as pos div PerTable —
      // key each probed bucket as t·16 + b
      .withColumn(
        "cand",
        array_distinct(flatten(transform(
          call_function("graft_lsh_probes", col("qv")),
          (b, pos) => coalesce(
            element_at(bmap, floor(pos / per).cast("long") * 16L + b.cast("long")),
            typedlit(Seq.empty[Long]))))))
      .withColumn(
        "scored",
        filter(
          transform(
            col("cand"),
            vid => struct(
              (call_function("graft_dot", col("qv"), element_at(vmap, vid)).cast("double") /
                (sqrt(col("nq")) * sqrt(element_at(nmap, vid)))).as("cos"),
              vid.as("vid"))),
          c => c.getField("vid") =!= col("query_id")))
      .withColumn(
        "top",
        slice(
          array_sort(
            col("scored"),
            (l, r) => when(l.getField("cos") > r.getField("cos"), -1)
              .when(l.getField("cos") < r.getField("cos"), 1)
              .when(l.getField("vid") < r.getField("vid"), -1)
              .when(l.getField("vid") > r.getField("vid"), 1)
              .otherwise(0)),
          1, 5))
      .select(col("query_id"), posexplode(col("top")).as(Seq("p", "n")))
      .select(
        col("query_id"),
        col("n.vid").as("neighbor_id"),
        round(col("n.cos"), 4).as("cos_sim"),
        (col("p") + 1).cast("int").as("rk"))
  }

  /** Streaming quality scoring (26th twin) — the online-inference twin
    * of [[graft.operators.TextAnalysis.qualityModel]]: each arriving
    * document is scored against a FROZEN Naive-Bayes weight table
    * ([[graft.operators.TextAnalysis.qualityTrain]]'s bounded artifact,
    * ≤ 4097 rows) compiled into the plan as a map LITERAL at wiring
    * time — the [[assignClusters]] frozen-model discipline: zero joins,
    * zero state, zero shuffles, zero static re-scans per trigger;
    * scoring is a narrow per-row map over the token array (the
    * crawl-ingest gate: score text the moment it arrives, admit or
    * reject before it ever lands in the corpus).
    *
    * Arithmetic mirrors batch exactly: per token, the hashed bucket
    * (3 hex md5 digits) looks up its micro-nat weight; UNKNOWN buckets
    * (token never seen at train time — possible on a live stream,
    * impossible in batch where apply and fit share the corpus) drop
    * from BOTH the sum and the token count, which is precisely the
    * batch inner join's semantics; a document with zero known buckets
    * emits nothing (batch: no row survives the join). nb_score and
    * pred_keep are the same exact-integer expressions, so ordered
    * replay is row-identical to batch (spec-pinned). */
  def scoreQuality(docs: DataFrame, weights: Map[Long, Long], prior: Long): DataFrame = {
    require(weights.nonEmpty, "scoreQuality needs a trained weight table")
    val wmap = typedlit(weights)
    def bucket(t: Column): Column =
      conv(substring(md5(t), 1, 3), 16, 10).cast("long")
    docs
      .filter(length(trim(col("text"))) > 0)
      .select(
        col("doc_id"),
        filter(
          transform(
            filter(split(col("text"), " "), t => t =!= ""),
            t => element_at(wmap, bucket(t))),
          w => w.isNotNull).as("ws"))
      .select(
        col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        aggregate(col("ws"), lit(0L), (a, w) => a + w).as("s"))
      .filter(col("n_tokens") > 0)
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(col("s") / (col("n_tokens") * 1e6), 4).as("nb_score"),
        when(lit(prior) + col("s") > 0, 1L).otherwise(0L).as("pred_keep"))
  }

  /** Streaming unigram tokenization (29th twin) — the online twin of
    * [[graft.operators.TextAnalysis.tokensUnigram]], completing the
    * arrival-time triple a crawl-ingest gate wants per document: the NB
    * policy score, the DSIR domain weight, and now the TOKEN BUDGET
    * under the production tokenizer (sequence-length cost is decided at
    * admission, not at packing time). The frozen ≤ V-row vocabulary
    * (fit once, apply everywhere) folds into the plan as the SAME
    * literal arrays the batch kernel takes, so scoring IS
    * `graft_unigram_ids` — one codegen'd native call per arriving
    * document, zero joins, zero state, zero shuffles, zero static
    * re-scans per trigger; per-piece lookup is O(1) through the
    * kernel's own hash table (the hash-backed shape [[scoreDsir]]'s
    * CPU disclosure names — native here because the kernel already
    * owns it). Output = the batch query's exact columns
    * (n_pieces, n_unk, ids_md5), so ordered replay is row-identical to
    * batch (spec-pinned); NULL text → 0 pieces + md5(''), the batch
    * contract. */
  def tokenizeUnigram(docs: DataFrame, pieces: Seq[String], costs: Seq[Long]): DataFrame = {
    require(pieces.nonEmpty && pieces.length == costs.length,
      "tokenizeUnigram needs a fitted vocabulary (pieces aligned with costs)")
    docs
      .select(
        col("doc_id"),
        call_function(
          "graft_unigram_ids", col("text"), typedlit(pieces), typedlit(costs)).as("ids"))
      .select(
        col("doc_id"),
        size(col("ids")).cast("long").as("n_pieces"),
        size(filter(col("ids"), i => i < 0)).cast("long").as("n_unk"),
        md5(concat_ws(",", col("ids").cast("array<string>")).cast("binary")).as("ids_md5"))
  }

  /** Streaming DSIR scoring (28th twin) — the online-inference twin of
    * [[graft.operators.TextAnalysis.dsir]], completing the pair of
    * quality scores a crawl-ingest gate wants at arrival time: the NB
    * policy score ([[scoreQuality]], "passes the curation policy") and
    * the DSIR importance weight (this one, "looks like the target
    * domain"). The frozen ≤ 4096-row weight table
    * ([[graft.operators.TextAnalysis.dsirWeights]] — fit once, apply
    * everywhere is DSIR's whole point) is compiled into the plan as a
    * map LITERAL at wiring time, the [[scoreQuality]] frozen-model
    * discipline: zero joins, zero state, zero shuffles, zero static
    * re-scans per trigger; scoring is a narrow per-row map over the
    * document's hashed word bigrams.
    *
    * Serve-path CPU cost, disclosed (ADVICE r14): `element_at` on a map
    * LITERAL is a linear scan of the literal's entries, so each bigram
    * lookup costs O(|table|) comparisons — up to 4096 — versus the batch
    * path's broadcast hash join. At the twin's fixture scale that is
    * noise; a high-throughput deployment with long documents should
    * swap the literal for a hash-backed lookup (a codegen'd Expression
    * closing over an immutable HashMap — the [[graft.functions]]
    * pattern), trading the zero-UDF plan purity this twin keeps for
    * O(1) per-bigram CPU. Correctness is unaffected either way
    * (spec-pinned row-identical to batch).
    *
    * Arithmetic mirrors batch exactly: the SAME bigram expression
    * (empty-filtered word split, adjacent concat), the SAME md5-prefix
    * bucket, per-occurrence micro-nat weight lookup; UNKNOWN buckets
    * (bigram never seen at fit time — possible on a live stream,
    * impossible in batch where fit and apply share the corpus) drop
    * from BOTH `dsir_micro` and `n_grams`, which is precisely the batch
    * inner join's semantics; a document with < 2 tokens or zero known
    * buckets emits nothing (batch: no bigrams / no surviving join row).
    * `dsir_micro` is the same exact long, the 4-dp mean the same one
    * guarded round, so ordered replay is row-identical to batch
    * (spec-pinned). */
  def scoreDsir(docs: DataFrame, weights: Map[Long, Long]): DataFrame = {
    require(weights.nonEmpty, "scoreDsir needs a fitted weight table")
    val wmap = typedlit(weights)
    def bucket(g: Column): Column =
      conv(substring(md5(g), 1, 3), 16, 10).cast("long")
    docs
      .select(
        col("doc_id"),
        expr("filter(split(text, ' '), x -> x != '')").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(
        col("doc_id"),
        filter(
          transform(
            expr(
              "transform(sequence(1, size(ws) - 1), " +
                "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"),
            g => element_at(wmap, bucket(g))),
          w => w.isNotNull).as("gw"))
      .select(
        col("doc_id"),
        size(col("gw")).cast("long").as("n_grams"),
        aggregate(col("gw"), lit(0L), (a, w) => a + w).as("dsir_micro"))
      .filter(col("n_grams") > 0)
      .select(
        col("doc_id"),
        col("n_grams"),
        col("dsir_micro"),
        round(col("dsir_micro") / (col("n_grams") * 1e6), 4).as("dsir_score"))
  }
}
