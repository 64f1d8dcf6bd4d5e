package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Wider analytics surface: multi-level aggregation (ROLLUP), pivoting,
  * set operations, histograms, exact percentiles, and date/string function
  * coverage — the operator families an analytics-engine user expects beyond
  * the reference's six queries.
  *
  * Scale notes: ROLLUP/pivot are single-shuffle grouped aggregations (pivot
  * with an explicit value list — never the implicit distinct-scan variant,
  * which adds a full extra pass at 100 TB). Histogram is a pure map +
  * groupBy on a derived integer. Percentiles use exact interpolation on
  * bounded groups (per-segment); for unbounded cardinality at scale the
  * approx_percentile sketch is the drop-in.
  */
object Analytics {

  /** ROLLUP over (region, nation): per-nation, per-region subtotal, and
    * grand-total customer counts in one pass. NULL group keys are labeled
    * so the oracle comparison is unambiguous. */
  def rollup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .select(
        coalesce(col("r_name"), lit("<all>")).as("region"),
        coalesce(col("n_name"), lit("<all>")).as("nation"),
        col("n_customers"))
      .orderBy("region", "nation")
  }

  val rollupSql: String =
    """SELECT COALESCE(r_name, '<all>') AS region,
              COALESCE(n_name, '<all>') AS nation,
              COUNT(*) AS n_customers
       FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY ROLLUP (r_name, n_name)
       ORDER BY region, nation"""

  /** CUBE over (market segment, order status): all four grouping
    * combinations — per (seg, status), per seg, per status, grand total —
    * in ONE shuffle (Spark expands grouping sets map-side; no extra pass
    * per combination). Money through integer cents as everywhere. */
  def cube(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.join(c, col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(floor(col("o_totalprice") * 100).cast("long")) / 100.0).as("total_price"))
      .select(
        coalesce(col("c_mktsegment"), lit("<all>")).as("mktsegment"),
        coalesce(col("o_orderstatus"), lit("<all>")).as("orderstatus"),
        col("n_orders"),
        col("total_price"))
      .orderBy("mktsegment", "orderstatus")
  }

  val cubeSql: String =
    """SELECT COALESCE(c_mktsegment, '<all>') AS mktsegment,
              COALESCE(o_orderstatus, '<all>') AS orderstatus,
              COUNT(*) AS n_orders,
              SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY CUBE (c_mktsegment, o_orderstatus)
       ORDER BY mktsegment, orderstatus"""

  /** Explicit GROUPING SETS — the third grouping variant beside
    * [[rollup]] and [[cube]]: exactly the (per-segment), (per-status),
    * and grand-total aggregates in ONE shuffle, without cube's unwanted
    * (segment × status) cross cells. The shape reports actually want
    * ("totals by each dimension independently") — computing it as three
    * separate groupBys would scan the fact join three times. Uses the
    * SQL front door (GROUPING SETS has no DataFrame-API verb), same
    * exact-cents discipline as the siblings; the cent sum divides by a
    * DOUBLE (Spark parses a bare `100.0` literal as DECIMAL, which would
    * dtype-drift from DuckDB's float64). */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
    Tables.customer(s, dir).createOrReplaceTempView("customer_gs")
    s.sql("""
      SELECT COALESCE(c_mktsegment, '<all>') AS mktsegment,
             COALESCE(o_orderstatus, '<all>') AS orderstatus,
             COUNT(*) AS n_orders,
             SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) / CAST(100 AS DOUBLE) AS total_price
      FROM orders_gs JOIN customer_gs ON o_custkey = c_custkey
      GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
      ORDER BY mktsegment, orderstatus""")
  }

  val groupingSetsSql: String =
    """SELECT COALESCE(c_mktsegment, '<all>') AS mktsegment,
              COALESCE(o_orderstatus, '<all>') AS orderstatus,
              COUNT(*) AS n_orders,
              SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
       ORDER BY mktsegment, orderstatus"""

  /** Higher-moment distribution profile per market segment: population
    * skewness and excess kurtosis of order price, derived from EXACT
    * integer power sums — the [[graft.operators.Windows!.anomaly]]
    * discipline lifted to 3rd/4th order. Price is quantized to whole
    * thousands (v ≤ ~500 at any SF, so the per-row v⁴ fits a BIGINT) and
    * Σv..Σv⁴ accumulate in DECIMAL(38,0) (DuckDB sums BIGINT to HUGEINT)
    * — both engines carry the sums exactly, convert the same integers to
    * DOUBLE, and evaluate structurally identical float expressions, so
    * skew/kurt agree bit-for-bit before the 4-dp display round.
    *
    * Scale shape: ONE groupBy on a 5-value key with map-side partial
    * aggregation — the shuffle moves 5×(n,s1..s4) tuples no matter the
    * corpus size; decimal accumulators can't overflow until ~1e27 rows. */
  def moments(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val v = floor(col("o_totalprice") / 1000).cast("long")
    val dec = (e: org.apache.spark.sql.Column) => e.cast("decimal(38,0)")
    val agg = o.join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("mktsegment"), v.as("v"))
      .groupBy("mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("v"))).as("s1"),
        sum(dec(col("v") * col("v"))).as("s2"),
        sum(dec(col("v") * col("v") * col("v"))).as("s3"),
        sum(dec(col("v") * col("v") * col("v") * col("v"))).as("s4"))
    val n = col("n_orders")
    val m1 = col("s1").cast("double") / n
    val r2 = col("s2").cast("double") / n
    val r3 = col("s3").cast("double") / n
    val r4 = col("s4").cast("double") / n
    val m2 = r2 - m1 * m1
    val m3 = r3 - lit(3) * m1 * r2 + lit(2) * m1 * m1 * m1
    val m4 = r4 - lit(4) * m1 * r3 + lit(6) * m1 * m1 * r2 -
      lit(3) * m1 * m1 * m1 * m1
    agg.select(
      col("mktsegment"),
      n,
      round(m1, 4).as("mean_k"),
      round(m2, 4).as("var_k"),
      // m2^1.5 as m2·√m2: sqrt and multiply are correctly-rounded IEEE
      // ops, pow is only ~1-ulp — the bit-equality claim needs the former
      round(m3 / (m2 * sqrt(m2)), 4).as("skewness"),
      round(m4 / (m2 * m2) - lit(3), 4).as("kurtosis"))
      .orderBy("mktsegment")
  }

  val momentsSql: String =
    """WITH v AS (
         SELECT c_mktsegment AS mktsegment,
                CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS v
         FROM orders JOIN customer ON o_custkey = c_custkey),
       m AS (
         SELECT mktsegment, COUNT(*) AS n_orders,
                SUM(v) AS s1, SUM(v*v) AS s2,
                SUM(v*v*v) AS s3, SUM(v*v*v*v) AS s4
         FROM v GROUP BY mktsegment),
       d AS (
         SELECT mktsegment, n_orders,
                CAST(s1 AS DOUBLE) / n_orders AS m1,
                CAST(s2 AS DOUBLE) / n_orders AS r2,
                CAST(s3 AS DOUBLE) / n_orders AS r3,
                CAST(s4 AS DOUBLE) / n_orders AS r4
         FROM m)
       SELECT mktsegment, n_orders,
              ROUND(m1, 4) AS mean_k,
              ROUND(r2 - m1*m1, 4) AS var_k,
              ROUND((r3 - 3*m1*r2 + 2*m1*m1*m1)
                    / ((r2 - m1*m1) * SQRT(r2 - m1*m1)), 4) AS skewness,
              ROUND((r4 - 4*m1*r3 + 6*m1*m1*r2 - 3*m1*m1*m1*m1)
                    / ((r2 - m1*m1) * (r2 - m1*m1)) - 3, 4) AS kurtosis
       FROM d
       ORDER BY mktsegment"""

  /** Market-basket co-occurrence: the top-20 part pairs most often
    * ordered together, with exact support counts and lift. The
    * association-mining shape feature pipelines run over carts, play
    * histories, co-citations.
    *
    * Scale shape: NO self-join — each order's distinct part set is
    * collected into one bounded array (≤ 13 items here; per-group state
    * is basket-sized at any corpus scale) and the ordered pairs are
    * generated INSIDE the array by a codegen'd lambda, so pair volume is
    * C(b,2) of a bounded b per order — linear in orders, never
    * O(parts²), and one orderkey shuffle replaces the two exchanges a
    * self-join would plan. The top-20 cut happens BEFORE the lift join
    * (aggregate-then-join): the 20 pairs MELT into ≤40 (side, pk) probe
    * rows that broadcast against ONE pass of the per-part counts — the
    * earlier two-join chain executed the partN subtree (a full
    * explode+count over every basket) once per side (the multi-consumer
    * subtree rule). Lift = n_pair·n_orders / (n_p1·n_p2) is rounded
    * integer-exactly ([[Windows.exactRoundSql]]), never a ROUND(double)
    * boundary. */
  def basketPairs(s: SparkSession, dir: String): DataFrame = {
    // the per-order item-set frame feeds THREE consumers (pairs, per-part
    // counts, order total) — persist it once via the stamp-keyed cache
    val baskets = PipelineCache.cached("basket:items", s, dir, "lineitem.parquet") {
      Tables.lineitem(s, dir)
        // a row without both keys belongs to no basket: a NULL orderkey
        // group would count as an "order" in n_orders (count(*) does not
        // skip the NULL group the way the old countDistinct did) and
        // silently inflate every lift — both engines exclude them
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .groupBy(col("l_orderkey").as("ok"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
    }
    // items is sorted ascending, so pairing each element with its later
    // siblings yields exactly the p1 < p2 combinations
    val pairs = baskets
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
             transform(slice(items, i + 2, size(items)),
                       y -> struct(x AS p1, y AS p2))))""")).as("p"))
      .select(col("p.p1").as("p1"), col("p.p2").as("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("n_pair"))
      .orderBy(col("n_pair").desc, col("p1"), col("p2"))
      .limit(20)
    val partN = baskets
      .select(explode(col("items")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("n_part"))
    val totalOrders = baskets.agg(count(lit(1)).as("n_orders"))
    // the ≤40-row melted probe set is the broadcast side — part counts
    // are catalog-sized at scale and stream past it in ONE pass
    val melted = pairs
      .select(
        col("p1"),
        col("p2"),
        col("n_pair"),
        explode(array(
          struct(lit("a").as("side"), col("p1").as("pk")),
          struct(lit("b").as("side"), col("p2").as("pk")))).as("m"))
      .select(col("p1"), col("p2"), col("n_pair"), col("m.side").as("side"), col("m.pk").as("pk"))
    partN
      .join(broadcast(melted), "pk")
      .groupBy("p1", "p2", "n_pair")
      .agg(
        max(when(col("side") === "a", col("n_part"))).as("n_p1"),
        max(when(col("side") === "b", col("n_part"))).as("n_p2"))
      .crossJoin(broadcast(totalOrders))
      .selectExpr(
        "p1",
        "p2",
        "n_pair",
        "n_p1",
        "n_p2",
        // products widen to DECIMAL(38,0) BEFORE multiplying: counts can
        // each reach ~|orders|, so the long product would overflow first
        Windows.exactRoundSql(
          "CAST(n_pair AS DECIMAL(38,0)) * n_orders",
          "CAST(n_p1 AS DECIMAL(38,0)) * n_p2",
          10000) + " AS lift")
      .orderBy(col("n_pair").desc, col("p1"), col("p2"))
  }

  val basketPairsSql: String =
    """WITH base AS (
         SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       pairs AS (
         SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS n_pair
         FROM base a JOIN base b ON a.ok = b.ok AND a.pk < b.pk
         GROUP BY 1, 2
         ORDER BY n_pair DESC, p1, p2
         LIMIT 20),
       part_n AS (SELECT pk, COUNT(*) AS n_part FROM base GROUP BY 1),
       total AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM base),
       j AS (
         SELECT p1, p2, n_pair,
                c1.n_part AS n_p1, c2.n_part AS n_p2,
                n_pair * n_orders AS num, c1.n_part * c2.n_part AS den
         FROM pairs
         JOIN part_n c1 ON p1 = c1.pk
         JOIN part_n c2 ON p2 = c2.pk
         CROSS JOIN total)
       SELECT p1, p2, n_pair, n_p1, n_p2,
              CAST((num // den) * 10000
                   + (2 * (num % den) * 10000 + den) // (2 * den) AS DOUBLE)
                / 10000.0 AS lift
       FROM j
       ORDER BY n_pair DESC, p1, p2"""

  /** Pivot: event counts per user across the five event types. The value
    * list is explicit — the implicit form needs a distinct pre-scan, a
    * whole extra pass over the fact table at scale. The oracle is the
    * conditional-aggregation equivalent (what pivot compiles to). */
  def pivot(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)

  val pivotSql: String =
    """SELECT user_id,
              COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
              COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
              COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
              COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
              COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
       FROM events
       GROUP BY user_id
       ORDER BY user_id"""

  /** Set operations: building-segment customers who placed a high-value
    * order (INTERSECT) minus those who also placed a low-value one
    * (EXCEPT). */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
    val high = o.filter(col("o_totalprice") > 200000.0).select(col("o_custkey").as("custkey"))
    val low = o.filter(col("o_totalprice") < 50000.0).select(col("o_custkey").as("custkey"))
    building.intersect(high).except(low)
  }

  val setOpsSql: String =
    """(SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0)
       EXCEPT
       SELECT o_custkey FROM orders WHERE o_totalprice < 50000.0
       ORDER BY custkey"""

  /** Fixed-width histogram of order totals: integer bucket index from pure
    * arithmetic (deterministic in any engine), 25k-wide buckets. */
  def histogram(s: SparkSession, dir: String): DataFrame =
    Tables
      .orders(s, dir)
      .groupBy(floor(col("o_totalprice") / 25000.0).cast("long").as("bucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        (floor(col("o_totalprice") / 25000.0).cast("long") * 25000).as("bucket_lo"))
      .select("bucket", "bucket_lo", "n_orders")
      .orderBy("bucket")

  val histogramSql: String =
    """SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
              CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) * 25000 AS bucket_lo,
              COUNT(*) AS n_orders
       FROM orders
       GROUP BY 1
       ORDER BY bucket"""

  /** Exact interpolated percentiles of order totals per market segment.
    * Money goes through integer cents so the sort keys are exact; the
    * interpolation `(1-f)*lo + f*hi` is the same formula in Spark's
    * `percentile` and DuckDB's `quantile_cont`. */
  def percentiles(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    // customer joins carry no broadcast hint (fact-scale at 100 TB; AQE
    // still broadcasts it at dev scale on its own) — here and below
    o.join(c, col("o_custkey") === col("c_custkey"))
      .withColumn("cents", floor(col("o_totalprice") * 100.0).cast("long"))
      .groupBy(col("c_mktsegment").as("mktsegment"))
      .agg(
        expr("percentile(cents, 0.5)").as("p50_cents"),
        expr("percentile(cents, 0.9)").as("p90_cents"),
        count(lit(1)).as("n_orders"))
      .select(
        col("mktsegment"),
        round(col("p50_cents") / 100.0, 2).as("median_price"),
        round(col("p90_cents") / 100.0, 2).as("p90_price"),
        col("n_orders"))
      .orderBy("mktsegment")
  }

  val percentilesSql: String =
    """SELECT c_mktsegment AS mktsegment,
              ROUND(quantile_cont(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT), 0.5) / 100.0, 2) AS median_price,
              ROUND(quantile_cont(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT), 0.9) / 100.0, 2) AS p90_price,
              COUNT(*) AS n_orders
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY 1
       ORDER BY mktsegment"""

  /** Date-dimension aggregation: orders by year and quarter with first/last
    * day bounds — the calendar-function coverage (year/quarter/month agree
    * across engines; day-of-week numbering does not and is avoided). */
  def dates(s: SparkSession, dir: String): DataFrame = {
    val od = col("o_orderdate").cast("timestamp")
    Tables
      .orders(s, dir)
      .groupBy(year(od).as("o_year"), quarter(od).as("o_quarter"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100).cast("long")).as("total_cents"))
      .select(
        col("o_year"),
        col("o_quarter"),
        col("n_orders"),
        (col("total_cents") / 100.0).as("total_price"))
      .orderBy("o_year", "o_quarter")
  }

  val datesSql: String =
    """SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
              CAST(QUARTER(o_orderdate) AS INT) AS o_quarter,
              COUNT(*) AS n_orders,
              SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
       FROM orders
       GROUP BY 1, 2
       ORDER BY o_year, o_quarter"""

  /** Trend analysis over the calendar series: quarter-over-quarter and
    * year-over-year revenue ratios via LAG — the dashboard "growth"
    * panel. Ratios divide the exact cent sums (one double division,
    * 4-dp round); the leading quarters carry NULL, matching SQL LAG.
    *
    * Scale shape: the aggregate-before-window discipline — the lag
    * window is unpartitioned but runs over the ALREADY-AGGREGATED
    * per-quarter frame, whose size is bounded by the calendar span
    * (dozens of rows at any corpus size), never the fact table. LAG(4)
    * as YoY assumes a dense quarter series (every quarter has orders —
    * true of any revenue corpus; for sparse series compose
    * [[graft.operators.Windows!.gapfill]] first). */
  def dateGrowth(s: SparkSession, dir: String): DataFrame = {
    val od = col("o_orderdate").cast("timestamp")
    val q = Tables
      .orders(s, dir)
      .groupBy(year(od).as("o_year"), quarter(od).as("o_quarter"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100).cast("long")).as("total_cents"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("o_year", "o_quarter")
    q.select(
      col("o_year"),
      col("o_quarter"),
      col("n_orders"),
      (col("total_cents") / 100.0).as("total_price"),
      round(col("total_cents").cast("double") / lag(col("total_cents"), 1).over(w), 4)
        .as("qoq_ratio"),
      round(col("total_cents").cast("double") / lag(col("total_cents"), 4).over(w), 4)
        .as("yoy_ratio"))
      .orderBy("o_year", "o_quarter")
  }

  val dateGrowthSql: String =
    """WITH q AS (
         SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
                CAST(QUARTER(o_orderdate) AS INT) AS o_quarter,
                COUNT(*) AS n_orders,
                SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS total_cents
         FROM orders GROUP BY 1, 2)
       SELECT o_year, o_quarter, n_orders,
              total_cents / 100.0 AS total_price,
              ROUND(CAST(total_cents AS DOUBLE) /
                    LAG(total_cents, 1) OVER (ORDER BY o_year, o_quarter), 4) AS qoq_ratio,
              ROUND(CAST(total_cents AS DOUBLE) /
                    LAG(total_cents, 4) OVER (ORDER BY o_year, o_quarter), 4) AS yoy_ratio
       FROM q
       ORDER BY o_year, o_quarter"""

  /** String-function coverage over part names: case mapping, substring,
    * first-token regex extraction, padded composite keys. */
  def strings(s: SparkSession, dir: String): DataFrame =
    Tables
      .part(s, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 3).as("name_prefix"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        concat_ws("|", col("p_brand"), lpad(col("p_partkey").cast("string"), 6, "0"))
          .as("brand_key"),
        length(col("p_name")).cast("long").as("name_len"))

  val stringsSql: String =
    """SELECT p_partkey,
              UPPER(p_name) AS name_upper,
              SUBSTR(p_name, 1, 3) AS name_prefix,
              regexp_extract(p_name, '^(\w+)', 1) AS first_word,
              p_brand || '|' || LPAD(CAST(p_partkey AS VARCHAR), 6, '0') AS brand_key,
              CAST(LENGTH(p_name) AS BIGINT) AS name_len
       FROM part
       ORDER BY p_partkey"""

  /** The reference dashboard's headline metrics (dashboard.py:44-56): one
    * row of cross-query sums.
    *
    * The first two metrics are sums-over-groups of per-group distinct
    * counts — and since the groups partition the order keys, they equal
    * plain conditional distinct counts over ONE orders ⋈ customer pass
    * (valid because FK integrity holds: every order has a customer, every
    * customer a nation — verified against the generated data; the oracle
    * keeps the composed three-query form and would catch any drift). The
    * third (top-10 nations by orders-per-customer) genuinely needs its own
    * grouped aggregation. Round 1 ran three full query pipelines; this
    * runs two joins instead of three and half the aggregate passes. */
  def dashMetrics(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val m12 = o
      .join(c, col("o_custkey") === col("c_custkey"))
      .agg(
        countDistinct(when(!col("o_orderstatus").isin("P"), col("o_orderkey")))
          .as("total_orders"),
        countDistinct(when(col("o_totalprice") > 150000.0, col("o_orderkey")))
          .as("total_high_value"))
    val customers = Relational
      .q6OrdersPerCust(s, dir)
      .agg(sum(col("total_customers")).as("top10_nation_customers"))
    m12.crossJoin(customers)
  }

  val dashMetricsSql: String =
    """WITH fo AS (
         SELECT c.c_mktsegment AS mktsegment, o.o_orderkey
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         WHERE o.o_orderstatus NOT IN ('P')),
       seg AS (SELECT mktsegment, COUNT(DISTINCT o_orderkey) AS num_orders FROM fo GROUP BY 1),
       hv AS (
         SELECT n.n_name AS nation, COUNT(DISTINCT o.o_orderkey) AS num_high_value
         FROM orders o
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         WHERE o.o_totalprice > 150000.0 GROUP BY 1),
       pc AS (
         SELECT n_name, COUNT(DISTINCT o_orderkey) AS total_orders,
                COUNT(DISTINCT o_custkey) AS total_customers,
                ROUND(COUNT(DISTINCT o_orderkey) * 1.0 / COUNT(DISTINCT o_custkey), 2) AS aopc
         FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
         WHERE TRIM(c_name) != '' GROUP BY n_name
         ORDER BY aopc DESC, n_name LIMIT 10)
       SELECT (SELECT CAST(SUM(num_orders) AS BIGINT) FROM seg) AS total_orders,
              (SELECT CAST(SUM(num_high_value) AS BIGINT) FROM hv) AS total_high_value,
              (SELECT CAST(SUM(total_customers) AS BIGINT) FROM pc) AS top10_nation_customers"""

  /** Catalog census: one row per table with its row count — the sanity
    * check run after every data drop. Each count is a metadata-cheap
    * aggregate (parquet row-group counts; no column data read) and the
    * union is 10 one-row frames. */
  def catalogCounts(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.names
      .map(n =>
        graft.sources.Tables(s, dir, n).agg(count(lit(1)).as("n_rows"))
          .select(lit(n).as("table_name"), col("n_rows")))
      .reduce(_ unionByName _)
      .orderBy("table_name")

  val catalogCountsSql: String =
    graft.sources.Tables.names
      .map(n => s"SELECT '$n' AS table_name, COUNT(*) AS n_rows FROM $n")
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")

  /** Data-quality profile of the orders table — the standard first pass
    * over any new corpus drop: row count, per-column null counts, value
    * bounds, key cardinality, and a referential-integrity count (orders
    * whose customer exists). One aggregate pass + one broadcast semi join;
    * at 100 TB this is a single scan. */
  def dqProfile(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val withCust = o
      .join(c.select(col("c_custkey")), col("o_custkey") === col("c_custkey"), "left_semi")
      .agg(count(lit(1)).as("n_with_customer"))
    o.agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("o_custkey"))).as("n_null_custkey"),
        (count(lit(1)) - count(col("o_orderstatus"))).as("n_null_status"),
        (count(lit(1)) - count(col("o_totalprice"))).as("n_null_price"),
        countDistinct(col("o_custkey")).as("n_distinct_cust"),
        countDistinct(col("o_orderstatus")).as("n_statuses"),
        (min(floor(col("o_totalprice") * 100).cast("long")) / 100.0).as("min_price"),
        (max(floor(col("o_totalprice") * 100).cast("long")) / 100.0).as("max_price"))
      .crossJoin(withCust)
  }

  val dqProfileSql: String =
    """SELECT (SELECT COUNT(*) FROM orders) AS n_rows,
              (SELECT COUNT(*) - COUNT(o_custkey) FROM orders) AS n_null_custkey,
              (SELECT COUNT(*) - COUNT(o_orderstatus) FROM orders) AS n_null_status,
              (SELECT COUNT(*) - COUNT(o_totalprice) FROM orders) AS n_null_price,
              (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_distinct_cust,
              (SELECT COUNT(DISTINCT o_orderstatus) FROM orders) AS n_statuses,
              (SELECT MIN(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) / 100.0 FROM orders) AS min_price,
              (SELECT MAX(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) / 100.0 FROM orders) AS max_price,
              (SELECT COUNT(*) FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer)) AS n_with_customer"""

  /** Sketch aggregates — the 100 TB path for cardinality and quantiles:
    * HyperLogLog++ (`approx_count_distinct`, rsd 1%) and a quantile sketch
    * (`approx_percentile`, accuracy 10000) next to their exact values.
    * Sketch outputs are engine-specific (rows-only check); the exact
    * columns anchor the error empirically. */
  def sketches(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.agg(
        countDistinct(col("o_custkey")).as("exact_custs"),
        approx_count_distinct(col("o_custkey"), rsd = 0.01).as("approx_custs"),
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("approx_median"),
        expr("percentile(CAST(FLOOR(o_totalprice * 100) AS BIGINT), 0.5) / 100.0")
          .as("exact_median"))
      .select(
        col("exact_custs"),
        col("approx_custs"),
        round(col("approx_median"), 2).as("approx_median"),
        round(col("exact_median"), 2).as("exact_median"))
  }

  /** Exact bivariate Pearson correlation per group — does quantity move
    * with price inside each return class? The feature-correlation audit
    * a training pipeline runs before trusting two signals as
    * independent ([[moments]]' two-variable sibling). Both engines build
    * the five power sums n, Σx, Σy, Σxy, Σx², Σy² from EXACT integers
    * (quantity as units, price as cents) in DECIMAL(38,0)/HUGEINT — at
    * corpus scale Σy² passes 2⁶³, so wide accumulators are correctness,
    * not caution — then evaluate ONE fixed double expression
    * (r = (n·Σxy − ΣxΣy)/(√(n·Σx²−Σx²̄)·√(n·Σy²−Σy²̄)); identical
    * integers → identical doubles → identical 4-dp round). Zero-variance
    * groups yield NULL (CASE-guarded in both engines, no DIVIDE_BY_ZERO
    * under ANSI). One map-side-combined shuffle of |groups| rows. */
  def corrQtyPrice(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(
        col("l_quantity").isNotNull && !isnan(col("l_quantity")) &&
          abs(col("l_quantity")) <= 1.0e9 &&
          col("l_extendedprice").isNotNull && !isnan(col("l_extendedprice")) &&
          abs(col("l_extendedprice")) <= 1.0e12)
      .select(
        col("l_returnflag").as("returnflag"),
        floor(col("l_quantity")).cast("long").as("x"),
        floor(col("l_extendedprice") * 100.0).cast("long").as("y"))
    val d38 = "decimal(38,0)"
    val agg = li
      .groupBy("returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(d38)).as("sx"),
        sum(col("y").cast(d38)).as("sy"),
        sum((col("x") * col("y")).cast(d38)).as("sxy"),
        sum((col("x") * col("x")).cast(d38)).as("sxx"),
        sum((col("y") * col("y")).cast(d38)).as("syy"))
    val (n, sx, sy, sxy, sxx, syy) = (
      col("n").cast("double"), col("sx").cast("double"), col("sy").cast("double"),
      col("sxy").cast("double"), col("sxx").cast("double"), col("syy").cast("double"))
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    agg.select(
      col("returnflag"),
      col("n"),
      round(sx / n, 4).as("mean_qty"),
      round(sy / (lit(100.0) * n), 4).as("mean_price"),
      when(vx > 0 && vy > 0, round((n * sxy - sx * sy) / (sqrt(vx) * sqrt(vy)), 4))
        .as("corr_qty_price"))
      .orderBy("returnflag")
  }

  val corrQtyPriceSql: String =
    """WITH v AS (
         SELECT l_returnflag AS returnflag,
                CAST(FLOOR(l_quantity) AS BIGINT) AS x,
                CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS y
         FROM lineitem
         WHERE l_quantity IS NOT NULL AND NOT isnan(l_quantity)
           AND abs(l_quantity) <= 1000000000
           AND l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
           AND abs(l_extendedprice) <= 1000000000000),
       m AS (
         SELECT returnflag, COUNT(*) AS n,
                SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
                SUM(CAST(x * y AS HUGEINT)) AS sxy,
                SUM(CAST(x * x AS HUGEINT)) AS sxx,
                SUM(CAST(y * y AS HUGEINT)) AS syy
         FROM v GROUP BY 1),
       d AS (
         SELECT returnflag, n,
                CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
                CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
                CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
         FROM m)
       SELECT returnflag, n,
              ROUND(sxd / nd, 4) AS mean_qty,
              ROUND(syd / (100.0 * nd), 4) AS mean_price,
              CASE WHEN nd * sxxd - sxd * sxd > 0 AND nd * syyd - syd * syd > 0
                   THEN ROUND((nd * sxyd - sxd * syd) /
                              (SQRT(nd * sxxd - sxd * sxd) * SQRT(nd * syyd - syd * syd)), 4)
              END AS corr_qty_price
       FROM d
       ORDER BY returnflag"""

  /** Winsorized per-segment price statistics — the robust-mean discipline
    * outlier-heavy pipelines apply before trusting an average: clamp each
    * order's price to the segment's exact nearest-rank [p5, p95] band,
    * then average the clamped cents. Reported beside the raw mean so the
    * winsorization's effect is visible in-row.
    *
    * Exactness: thresholds are NEAREST-RANK order statistics — the value
    * at sorted position ⌈p·n⌉, an integer ceil computed as (p·100·n+99)
    * DIV 100 — picked positionally, so duplicate values and tie order
    * can't change them; both engines clamp the same exact cents and the
    * single end division is one fixed double expression.
    *
    * Scale shape: ONE shuffle on mktsegment carries everything — the
    * row_number sort, the two full-frame threshold windows (same
    * exchange, no extra sort for the unordered frames) and the final
    * groupBy ride the same partitioning. The customer join carries NO
    * broadcast hint: customer is fact-scaled (~150k rows/SF), so a
    * forced broadcast would blow the 8 GB limit at large SF — AQE
    * picks broadcast at small SF and shuffle join at scale.
    * A per-segment sort at 100 TB is the honest cost of EXACT order
    * statistics (cf. [[sketches]] for the approximate path); segments
    * are few and AQE splits a skewed one. */
  def winsorized(s: SparkSession, dir: String): DataFrame = {
    val v = Tables.orders(s, dir)
      .filter(
        col("o_totalprice").isNotNull && !isnan(col("o_totalprice")) &&
          abs(col("o_totalprice")) <= 1.0e14)
      .join(
        Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(
        col("c_mktsegment").as("mktsegment"),
        floor(col("o_totalprice") * 100.0).cast("long").as("c"))
    val wSeg = Window.partitionBy("mktsegment")
    val wSort = wSeg.orderBy("c")
    val ranked = v
      .withColumn("rn", row_number().over(wSort))
      .withColumn("n", count(lit(1)).over(wSeg))
      .withColumn("lo", max(when(col("rn") === expr("(5 * n + 99) DIV 100"), col("c"))).over(wSeg))
      .withColumn("hi", max(when(col("rn") === expr("(95 * n + 99) DIV 100"), col("c"))).over(wSeg))
    ranked
      .groupBy("mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        round(max(col("lo")) / 100.0, 2).as("p5"),
        round(max(col("hi")) / 100.0, 2).as("p95"),
        round(
          sum(least(greatest(col("c"), col("lo")), col("hi"))).cast("double") /
            (lit(100.0) * count(lit(1)).cast("double")),
          4).as("win_mean"),
        round(
          sum(col("c")).cast("double") / (lit(100.0) * count(lit(1)).cast("double")),
          4).as("raw_mean"))
      .orderBy("mktsegment")
  }

  val winsorizedSql: String =
    """WITH v AS (
         SELECT c_mktsegment AS mktsegment,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS c
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_totalprice IS NOT NULL AND NOT isnan(o_totalprice)
           AND abs(o_totalprice) <= 100000000000000),
       r AS (
         SELECT mktsegment, c,
                row_number() OVER (PARTITION BY mktsegment ORDER BY c) AS rn,
                COUNT(*) OVER (PARTITION BY mktsegment) AS n
         FROM v),
       t AS (
         SELECT mktsegment, c,
                MAX(CASE WHEN rn = (5 * n + 99) // 100 THEN c END)
                  OVER (PARTITION BY mktsegment) AS lo,
                MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN c END)
                  OVER (PARTITION BY mktsegment) AS hi
         FROM r)
       SELECT mktsegment, COUNT(*) AS n_orders,
              ROUND(MAX(lo) / 100.0, 2) AS p5,
              ROUND(MAX(hi) / 100.0, 2) AS p95,
              ROUND(CAST(SUM(LEAST(GREATEST(c, lo), hi)) AS DOUBLE)
                    / (100.0 * CAST(COUNT(*) AS DOUBLE)), 4) AS win_mean,
              ROUND(CAST(SUM(c) AS DOUBLE)
                    / (100.0 * CAST(COUNT(*) AS DOUBLE)), 4) AS raw_mean
       FROM t
       GROUP BY 1
       ORDER BY mktsegment"""

  /** Join-key skew census over the fact-table keys — the diagnostic a
    * 100 TB deployment runs BEFORE choosing a shuffle strategy, turned
    * into an operator. For each candidate join/aggregation key it
    * reports the key-space shape (rows, keys, max rows under one key,
    * the count of heavy keys holding > 10× their fair share) and a
    * recommended salting factor: `ceil(max_key_rows / floor-average)`,
    * i.e. how many sub-keys the hottest key needs to look like an
    * average one. heavy is decided by EXACT integer arithmetic —
    * `c > (10 · n_rows) DIV n_keys` is the rational `c·n_keys >
    * 10·n_rows` without the overflow of the cross-multiplied form
    * (10·n_rows stays < 2⁶³ up to ~10¹⁷ rows) and without a float
    * threshold the oracle could round differently.
    *
    * Shape per key: one map-side-combined count groupBy (the only
    * corpus-sized shuffle), then a 1-row stats aggregate that is
    * broadcast back over the counts frame for the heavy census — the
    * counts subtree feeds both consumers through one planned exchange
    * (ReuseExchange). Output is ≤ |probed keys| rows. */
  def skewProbe(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    Seq(
      keyProbe(Tables.events(s, dir), "user_id", "events.user_id"),
      keyProbe(li, "l_orderkey", "lineitem.l_orderkey"),
      keyProbe(li, "l_partkey", "lineitem.l_partkey"),
      keyProbe(li, "l_suppkey", "lineitem.l_suppkey"),
      keyProbe(Tables.orders(s, dir), "o_custkey", "orders.o_custkey"))
      .reduce(_ unionByName _)
      .orderBy("key_name")
  }

  /** One key's census — spec entry point for synthetic skew shapes. */
  private[graft] def keyProbe(df: DataFrame, key: String, tag: String): DataFrame =
    keyCensus(df.groupBy(col(key)).agg(count(lit(1)).as("c")), tag)

  /** The census over a per-key counts frame `(key, c)` — shared VERBATIM
    * with the streaming twin ([[graft.streaming.EventStreams.keyCounts]]'s
    * sink applies this to each trigger's complete counts table), so
    * batch/stream parity is structural, not just test-pinned (the
    * heavyHitters/wordCensus discipline). */
  private[graft] def keyCensus(counts: DataFrame, tag: String): DataFrame = {
    val stats = counts.agg(
      sum(col("c")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("c")).as("max_key_rows"))
    val heavy = counts
      .join(broadcast(stats))
      .filter(expr("c > (10 * n_rows) DIV n_keys"))
      .agg(count(lit(1)).as("heavy_keys"))
    stats
      .join(broadcast(heavy))
      .select(
        lit(tag).as("key_name"),
        col("n_rows"),
        col("n_keys"),
        col("max_key_rows"),
        col("heavy_keys"),
        expr(
          "(max_key_rows + (n_rows DIV n_keys) - 1) DIV (n_rows DIV n_keys)")
          .as("salt_factor"),
        round(col("max_key_rows") / col("n_rows").cast("double"), 6).as("top_share"))
  }

  /** The skew-REMEDIATION contract query — the third act of the skew
    * story ([[skewProbe]] diagnoses, the streaming monitor watches, this
    * remediates): supplier revenue per nation computed THROUGH
    * [[Scale.saltedJoin]] on the lineitem ⋈ supplier key, with the PLAIN
    * join as its oracle. Hash-exact passage proves the salting utility
    * changes the partitioning — the build side replicated `salt` ways,
    * the hot probe key spread over `salt` tasks — and never the result,
    * under the driver's own gate (the text_search_idx move: a test-only
    * utility promoted to a driver-checked contract). Honest scale note:
    * supplier is a DIM a production plan would broadcast; the query
    * exists to gate-check the fact-fact salting shape on a join whose
    * plain twin is SQL-expressible, not to claim salting beats
    * broadcast here. Revenue sums exact decimals before ONE double
    * cast (the q5 discipline), so the result is partitioning- and
    * order-independent by construction — which is precisely what makes
    * the salted/plain identity checkable by hash. */
  def joinSkewSalted(s: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(s, dir)
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(s, dir)
    Scale
      .saltedJoin(li, sup, col("l_suppkey"), col("s_suppkey"), 8)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        count(lit(1)).as("n_items"),
        sum(
          expr("CAST(l_extendedprice AS DECIMAL(14,2)) * " +
            "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"))
          .cast("double")
          .as("revenue"))
      .orderBy("n_name")
  }

  val joinSkewSaltedSql: String =
    """SELECT n_name, COUNT(*) AS n_items,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) *
                       (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                AS revenue
       FROM lineitem
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       GROUP BY n_name
       ORDER BY n_name"""

  private def keyProbeSqlBlock(table: String, key: String, idx: Int): String =
    s"""k$idx AS (SELECT COUNT(*) AS c FROM $table GROUP BY $key),
       s$idx AS (SELECT CAST(SUM(c) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
                        MAX(c) AS max_key_rows FROM k$idx),
       p$idx AS (
         SELECT '$table.$key' AS key_name, n_rows, n_keys, max_key_rows,
                (SELECT COUNT(*) FROM k$idx, s$idx
                 WHERE c > (10 * n_rows) // n_keys) AS heavy_keys,
                (max_key_rows + (n_rows // n_keys) - 1) // (n_rows // n_keys)
                  AS salt_factor,
                ROUND(max_key_rows / CAST(n_rows AS DOUBLE), 6) AS top_share
         FROM s$idx)"""

  val skewProbeSql: String = {
    val blocks = Seq(
      ("events", "user_id"),
      ("lineitem", "l_orderkey"),
      ("lineitem", "l_partkey"),
      ("lineitem", "l_suppkey"),
      ("orders", "o_custkey"))
    s"""WITH ${blocks.zipWithIndex
        .map { case ((t, k), i) => keyProbeSqlBlock(t, k, i + 1) }
        .mkString(",\n")}
       ${(1 to blocks.size).map(i => s"SELECT * FROM p$i").mkString(" UNION ALL ")}
       ORDER BY key_name"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_probe" -> (skewProbe _),
    "join_skew_salted" -> (joinSkewSalted _),
    "agg_winsorized" -> (winsorized _),
    "agg_corr" -> (corrQtyPrice _),
    "agg_sketches" -> (sketches _),
    "catalog_counts" -> (catalogCounts _),
    "dq_profile" -> (dqProfile _),
    "agg_cube" -> (cube _),
    "agg_grouping_sets" -> (groupingSets _),
    "agg_moments" -> (moments _),
    "basket_pairs" -> (basketPairs _),
    "agg_rollup" -> (rollup _),
    "agg_pivot" -> (pivot _),
    "set_ops" -> (setOps _),
    "agg_histogram" -> (histogram _),
    "agg_percentiles" -> (percentiles _),
    "date_agg" -> (dates _),
    "date_growth" -> (dateGrowth _),
    "string_funcs" -> (strings _),
    "dash_metrics" -> (dashMetrics _))

  val oracles: Map[String, String] = Map(
    "skew_probe" -> skewProbeSql,
    "join_skew_salted" -> joinSkewSaltedSql,
    "agg_winsorized" -> winsorizedSql,
    "agg_corr" -> corrQtyPriceSql,
    "catalog_counts" -> catalogCountsSql,
    "dq_profile" -> dqProfileSql,
    "agg_cube" -> cubeSql,
    "agg_grouping_sets" -> groupingSetsSql,
    "agg_moments" -> momentsSql,
    "basket_pairs" -> basketPairsSql,
    "agg_rollup" -> rollupSql,
    "agg_pivot" -> pivotSql,
    "set_ops" -> setOpsSql,
    "agg_histogram" -> histogramSql,
    "agg_percentiles" -> percentilesSql,
    "date_agg" -> datesSql,
    "date_growth" -> dateGrowthSql,
    "string_funcs" -> stringsSql,
    "dash_metrics" -> dashMetricsSql)
}
