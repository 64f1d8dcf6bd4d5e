package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale techniques that only show up in *how* a query runs, not what it
  * returns: bucketed co-located joins and skew salting. Exercised by
  * `ScaleSpec` with physical-plan assertions (no Exchange on the bucketed
  * join; identical results for salted vs plain join).
  */
object Scale {

  /** Persist orders + lineitem bucketed by order key, then join the saved
    * tables. With matching bucket counts Spark plans a SortMergeJoin with
    * NO shuffle exchange — at 100 TB this turns the nightly fact-fact join
    * from the dominant shuffle into a local merge per bucket. The shuffle
    * is paid once at write time and amortized over every later join. */
  def bucketedOrdersJoin(
      s: SparkSession,
      dir: String,
      buckets: Int = 8): DataFrame = {
    // idempotent: drop catalog entries AND their managed locations (a
    // crashed prior run can leave the directory without the table)
    val warehouse = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    for (t <- Seq("graft_orders_b", "graft_lineitem_b")) {
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(warehouse, t)
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    graft.sources.Tables
      .orders(s, dir)
      .write
      .mode("overwrite")
      .bucketBy(buckets, "o_orderkey")
      .sortBy("o_orderkey")
      .saveAsTable("graft_orders_b")
    graft.sources.Tables
      .lineitem(s, dir)
      .write
      .mode("overwrite")
      .bucketBy(buckets, "l_orderkey")
      .sortBy("l_orderkey")
      .saveAsTable("graft_lineitem_b")
    val o = s.table("graft_orders_b")
    val l = s.table("graft_lineitem_b")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"))
      .orderBy("o_orderpriority")
  }

  /** Distributed row_number: adds exact 1-based rank `__rn` (ordered by
    * `orderCols` within each `partCols` group) and the group size `__n` —
    * WITHOUT ever sorting a whole group on one task. A plain
    * `row_number().over(Window.partitionBy(partCols))` puts each group's
    * entire row set through a single task's sort: when `partCols` has low
    * cardinality (e.g. 5 market segments) that is the full table on 5
    * tasks, a scale-killer this utility exists to replace.
    *
    * The group is split on a DETERMINISTIC value-derived bucket of the
    * leading order column (fixed-width over the observed [min, max] — one
    * cheap bounds aggregate broadcast as a single row), NOT on
    * `spark_partition_id()` or `repartitionByRange`: the rank is joined
    * against offsets computed in a second DAG branch, and a bucket id that
    * depended on physical partitioning could differ between the two
    * branches if the planner doesn't reuse the exchange — value-derived
    * buckets are identical however often the subtree is recomputed.
    *
    * Plan shape, every sort bounded, the expensive input computed ONCE:
    *   1. bounds: 1-row min/max of `bucketOn` — or, with `quantileBounds`,
    *      one approx_percentile boundary array — (by default over `df`;
    *      pass `boundsOf` to aim this scan at a cheaper frame — see below);
    *      `__bkt = (v - lo) * buckets DIV (hi - lo + 1)` — monotone in v,
    *      so bucket order == value order and equal values share a bucket.
    *   2. local rank within (`__bkt`, partCols) — one shuffle spread over
    *      buckets×groups sort groups of ~|group|/buckets rows.
    *   3. per-(bucket, group) sizes = `max(__lrn)` taken FROM the ranked
    *      frame itself (the bucket count IS the max local rank), so there
    *      is a single lineage through the expensive scan/join: the
    *      aggregate's required distribution (`__bkt`, partCols) is the
    *      window's own shuffle, which Spark's ReuseExchange dedupes across
    *      the two consumers (plan-asserted in ScaleSpec). Sizes (one row
    *      per bucket×group) → running per-group offsets via a window over
    *      that TINY frame (bounded by bucket count, not data) → broadcast
    *      join back: `__rn = local rank + preceding buckets' count`,
    *      `__n` = group size.
    *
    * `bucketOn` must be the leading column of `orderCols` (or monotone in
    * it), numeric, and NON-NULL — null would silently vanish in the bucket
    * join, so it is asserted loudly instead (coalesce nulls to a sentinel
    * below the real minimum first if you need them ranked). The bucket is
    * computed in DOUBLE space: every step (long→double cast, subtracting /
    * multiplying / dividing by per-run constants, clamping, floor) is
    * monotone non-decreasing under IEEE rounding, which is the only
    * property bucketing needs — so ANY Long span is safe; rounding can
    * only merge neighboring values into one bucket (balance, not
    * correctness). `orderCols` should be a total order (include a unique
    * tiebreaker).
    *
    * `boundsOf`: the bucket range only needs MONOTONICITY for correctness
    * (out-of-range values land in buckets <0 or ≥`buckets`, which rank
    * fine — coverage affects balance, not answers), so the bounds scan can
    * run on any frame where `bucketOn` resolves whose range roughly covers
    * `df`'s — e.g. a narrow single-column projection of one base table
    * instead of the full join. Fixed-width buckets balance when values are
    * roughly uniform; for pathological value skew pass
    * `quantileBounds = true` to split on `approx_percentile` boundaries
    * instead (equal-frequency buckets by construction; the bucket becomes
    * a boundary count, still monotone). Quantile mode runs the bounds
    * aggregate EAGERLY (one driver-visible row) and embeds the boundaries
    * as a literal: the sketch is merge-order-dependent, so leaving it as a
    * lazy subquery could bucket the two DAG branches differently on
    * recomputation — the literal is stable by construction. A hot single
    * VALUE is inherent to ranking (ties must meet one task) and is what
    * the tiebreaker keeps bounded under either mode. */
  def globalRank(
      df: DataFrame,
      partCols: Seq[String],
      bucketOn: Column,
      orderCols: Seq[Column],
      buckets: Int = 256,
      boundsOf: Option[DataFrame] = None,
      quantileBounds: Boolean = false): DataFrame = {
    val boundsSrc = boundsOf.getOrElse(df)
    if (quantileBounds) {
      // interior quantile boundaries (1/b .. (b-1)/b). approx_percentile
      // returns observed values, so boundaries are exact members of the
      // domain; accuracy 10k bounds the sketch at ~10k centroids — a
      // constant-size aggregate state regardless of input size.
      //
      // Collected EAGERLY into a literal (one driver-side row), unlike the
      // lazy min/max subquery of fixed-width mode: the sketch's result
      // depends on partial-merge order, so two recomputations could yield
      // slightly different boundaries — and a bucket id that differed
      // between the rank and offset branches would silently corrupt ranks
      // (the exact recomputation hazard the value-derived-bucket design
      // exists to rule out). A literal boundary array is immune by
      // construction. min/max need no such treatment: they are
      // merge-order-independent.
      val row = boundsSrc
        .agg(
          percentile_approx(
            bucketOn,
            lit((1 until buckets).map(_.toDouble / buckets).toArray),
            lit(10000)).as("__bs"))
        .head()
      require(
        !row.isNullAt(0),
        "globalRank: bounds frame is empty or all-NULL — it must observe at least one bucketOn value")
      val boundary = array(row.getSeq[Any](0).map(lit): _*)
      // # of boundaries <= v: monotone non-decreasing in v, equal values
      // share a bucket, and every bucket holds ~1/buckets of the data by
      // construction — immune to value skew. The lambda runs over a
      // ≤(buckets-1)-element literal array per row.
      return rankWithBuckets(
        df.filter(
          assert_true(
            bucketOn.isNotNull,
            lit("globalRank: bucketOn is NULL — coalesce nulls to a sentinel before ranking"))
            .isNull)
          .withColumn("__bkt", size(filter(boundary, b => b <= bucketOn)).cast("long")),
        partCols,
        orderCols)
    }
    val bounds = boundsSrc.agg(min(bucketOn).as("__lo"), max(bucketOn).as("__hi"))
    val rawBucket =
        // all-double arithmetic: overflow-free for any Long span (a prior
        // exact-long version overflowed at spans > 2^63/buckets), and
        // monotone non-decreasing at every step, so bucket order still
        // follows value order. The clamp bounds the bucket id when boundsOf
        // under-covers df (a far outlier would otherwise blow the long
        // cast); clamping is itself monotone, so outliers just pool in the
        // edge bucket — balance degrades, answers don't.
        floor(
          least(
            greatest(
              (bucketOn.cast("double") - col("__lo").cast("double")) * buckets /
                (col("__hi").cast("double") - col("__lo").cast("double") + lit(1.0d)),
              lit(-1e15d)),
            lit(1e15d))).cast("long")
    val bucketed = df
      .crossJoin(broadcast(bounds))
      .filter(
        assert_true(
          bucketOn.isNotNull,
          lit("globalRank: bucketOn is NULL — coalesce nulls to a sentinel before ranking"))
          .isNull)
      .filter(
        assert_true(
          col("__lo").isNotNull,
          lit("globalRank: bounds frame is empty or all-NULL — it must observe at least one bucketOn value"))
          .isNull)
      .withColumn("__bkt", rawBucket)
      .drop("__lo", "__hi")
    rankWithBuckets(bucketed, partCols, orderCols)
  }

  /** Exact NTILE(k) over [[globalRank]]'s (__rn, __n) outputs as a SQL
    * CASE (standard semantics: the first __n mod k tiles get
    * ceil(__n/k) rows) — ONE definition shared by every consumer
    * (win_ntile's quartiles, train_curriculum's phases) so the
    * remainder arithmetic can never fork between sites. */
  private[operators] def ntileExpr(k: Int): String =
    s"""CASE WHEN __rn <= (__n % $k) * (__n DIV $k + 1)
             THEN (__rn - 1) DIV (__n DIV $k + 1) + 1
             ELSE (__n % $k) + (__rn - (__n % $k) * (__n DIV $k + 1) - 1) DIV (__n DIV $k) + 1
        END"""

  /** Steps 2-3 of [[globalRank]]: local rank within (`__bkt`, partCols),
    * per-bucket sizes from the ranked frame itself, offsets over the tiny
    * counts frame, broadcast join back. Requires a deterministic,
    * value-monotone, non-null `__bkt` column (both bucketing modes above
    * guarantee it). */
  private def rankWithBuckets(
      withBkt: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[Column]): DataFrame = {
    // the isnotnull filter is semantically a no-op (both bucket modes
    // assert their inputs non-null) but load-bearing for the plan: it
    // plants the isnotnull(__bkt) constraint BELOW the shuffle in both
    // consumers, so constraint inference doesn't place it differently per
    // branch — which would break the exchange's canonical equality and
    // with it the stage reuse that makes the expensive input run once
    val bucketed = withBkt.filter(col("__bkt").isNotNull)
    val localKeys = ("__bkt" +: partCols).map(col)
    val wLocal = Window.partitionBy(localKeys: _*).orderBy(orderCols: _*)
    val local = bucketed.withColumn("__lrn", row_number().over(wLocal))
    val counts = local.groupBy(localKeys: _*).agg(max(col("__lrn")).as("__cnt"))
    val wGroup = Window.partitionBy(partCols.map(col): _*)
    val off = counts
      .withColumn(
        "__offset",
        coalesce(
          sum(col("__cnt")).over(wGroup.orderBy(col("__bkt")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(wGroup))
      .drop("__cnt")
    local
      .join(broadcast(off), "__bkt" +: partCols)
      .withColumn("__rn", col("__lrn") + col("__offset"))
      .drop("__bkt", "__lrn", "__offset")
  }

  /** Salted join for skewed keys: replicate the build side `salt` times and
    * scatter the probe side across replicas with a deterministic hash.
    * Results are identical to the plain join; the skewed key's rows land on
    * `salt` tasks instead of one. (AQE's skew-join split handles the same
    * problem reactively; salting is the proactive version for known-skewed
    * keys like null-heavy foreign keys.) */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: Column,
      buildKey: Column,
      salt: Int): DataFrame = {
    val salted = build
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    val probeSalted = probe
      .withColumn("__salt", pmod(xxhash64(probeKey), lit(salt)).cast("int"))
    probeSalted
      .join(salted, probeKey === buildKey && probeSalted("__salt") === salted("__salt"))
      .drop("__salt")
  }
}
