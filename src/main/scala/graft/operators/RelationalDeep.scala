package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The second relational wave: TPC-H's remaining *plan shapes* on this
  * schema — each query here exists because it exercises a distinct
  * decorrelation or pushdown pattern the first wave doesn't:
  *
  *   - q7_nation_flow   — multi-fact star with TWO roles of one dimension
  *   - q8_mkt_share     — conditional-aggregate market share (share-of-
  *                        group without a second scan)
  *   - q10_returned     — filtered fact-fact-fact join + partial top-k
  *   - q11_concentration— HAVING vs a scalar total (exchange-reuse form)
  *   - q13_cust_dist    — left-outer + double aggregation (zero groups kept)
  *   - q14_promo_share  — share-of-scan conditional aggregate, one row
  *   - q15_top_supplier — argmax via 1-row aggregate join (exchange reuse)
  *   - q17_small_qty    — correlated scalar subquery decorrelated to a
  *                        PARTITIONED WINDOW (no join-back, no 2nd scan)
  *   - q19_brackets     — disjunctive OR-of-ANDs pushdown
  *   - q22_idle_rich    — scalar-subquery threshold + anti join
  *
  * Numeric discipline follows [[Relational]]: DECIMAL money sums (exact,
  * order-independent), integer counts, ONE final double cast/division.
  * Revenue is the shared `rev` expression — byte-identical decimal typing
  * to sql_supplier_rev's, so every oracle replays it exactly.
  *
  * Scale notes (100 TB): every aggregate is partial (map-side combine);
  * dimension tables (nation/region, 25/5 rows at ANY SF) broadcast by
  * hint; fact-scaled tables (part/supplier/customer grow with SF) are
  * NEVER hinted — AQE decides (the round-8 winsorized advice). Top-k cuts
  * are sort-then-limit = TakeOrdered partial top-k, never a global sort.
  */
object RelationalDeep {

  private def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))

  /** extendedprice · (1 − discount), exact decimal — the engine-shared
    * revenue definition (same casts as sql_supplier_rev's SQL). */
  private def rev: Column =
    dec(col("l_extendedprice"), 14, 2) * (dec(lit(1), 4, 2) - dec(col("l_discount"), 4, 2))

  /** The identical rendering for DuckDB oracles. */
  private val revSql =
    "CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  /** TPC-H Q7's shape: revenue flow between DIFFERENT nations — supplier
    * nation ships, customer nation buys — per year. The nation dimension
    * is joined twice in two ROLES (seller / buyer), so the two broadcast
    * joins carry disambiguated key columns instead of a self-join alias
    * dance. Ship years 1996-97 filter at the scan.
    *
    * Scale shape: lineitem⋈orders and ⋈customer / ⋈supplier are fact-fact
    * shuffle joins on their natural keys (AQE skew-splits); both nation
    * joins broadcast 25 rows; the (supp_nation, cust_nation, year) census
    * is bounded at 25·24·|years| — partial aggregation collapses
    * map-side, the final frame is tiny. */
  def q7NationFlow(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1998-01-01")
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("ship_year"), rev.as("r"))
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    val supN = Tables.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val custN = Tables.nation(s, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
      .join(broadcast(custN), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "ship_year")
      .agg(sum(col("r")).cast("double").as("volume"), count(lit(1)).as("n_items"))
      .orderBy(col("volume").desc, col("supp_nation"), col("cust_nation"), col("ship_year"))
      .limit(30)
  }

  val q7NationFlowSql: String =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
              EXTRACT(year FROM l_shipdate) AS ship_year,
              CAST(SUM($revSql) AS DOUBLE) AS volume,
              COUNT(*) AS n_items
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation sn ON s_nationkey = sn.n_nationkey
       JOIN nation cn ON c_nationkey = cn.n_nationkey
       WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         AND sn.n_name <> cn.n_name
       GROUP BY 1, 2, 3
       ORDER BY volume DESC, supp_nation, cust_nation, ship_year
       LIMIT 30"""

  /** TPC-H Q8's shape: NATION_2's market share of ASIA-customer revenue
    * per year — share-of-group as a CONDITIONAL aggregate (`sum(when)`
    * over the SAME rows), never a second scan or a self-join: the
    * numerator is a predicate, not a query. Both sums stay exact decimal;
    * the share is ONE double division at the end.
    *
    * Scale shape: same star as q7 (fact shuffles + 25-row broadcasts,
    * plus region pre-filtering nation to ASIA's 5 rows BEFORE the
    * broadcast); |years| output rows. */
  def q8MktShare(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"), rev.as("r"))
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    val asiaN = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val supN = Tables.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(asiaN), col("c_nationkey") === col("cn_key"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
      .groupBy("o_year")
      .agg(
        sum(when(col("supp_nation") === "NATION_2", col("r")).otherwise(dec(lit(0), 14, 2)))
          .as("n2"),
        sum(col("r")).as("tot"))
      .select(
        col("o_year"),
        round(col("n2").cast("double") / col("tot").cast("double"), 4).as("mkt_share"),
        col("tot").cast("double").as("asia_revenue"))
      .orderBy("o_year")
  }

  val q8MktShareSql: String =
    s"""WITH star AS (
         SELECT EXTRACT(year FROM o_orderdate) AS o_year, sn.n_name AS supp_nation,
                $revSql AS r
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation cn ON c_nationkey = cn.n_nationkey
         JOIN region   ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation sn ON s_nationkey = sn.n_nationkey)
       SELECT o_year,
              ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN r
                                  ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE)
                    / CAST(SUM(r) AS DOUBLE), 4) AS mkt_share,
              CAST(SUM(r) AS DOUBLE) AS asia_revenue
       FROM star GROUP BY 1 ORDER BY o_year"""

  /** TPC-H Q10's shape: which customers returned the most revenue in a
    * window? Returned-flag + order-date filters land AT THE SCANS (both
    * reach parquet as pushed predicates), the three fact tables shuffle-
    * join on their keys, and the top-20 cut is a TakeOrdered partial
    * top-k — never a global sort of the customer census. */
  def q10Returned(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), rev.as("r"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-07-01")
      .select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal").as("acctbal"))
    val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name").as("nation"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey").as("custkey"), col("c_name"), col("nation"), col("acctbal"))
      .agg(sum(col("r")).cast("double").as("lost_revenue"), count(lit(1)).as("n_returns"))
      .orderBy(col("lost_revenue").desc, col("custkey"))
      .limit(20)
  }

  val q10ReturnedSql: String =
    s"""SELECT c_custkey AS custkey, c_name, n_name AS nation,
              c_acctbal AS acctbal,
              CAST(SUM($revSql) AS DOUBLE) AS lost_revenue,
              COUNT(*) AS n_returns
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation   ON c_nationkey = n_nationkey
       WHERE l_returnflag = 'R'
         AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
       GROUP BY 1, 2, 3, 4
       ORDER BY lost_revenue DESC, custkey
       LIMIT 20"""

  /** TPC-H Q11's shape: revenue concentration — parts whose revenue
    * exceeds 1.5× the MEAN part revenue (mean-relative, so the predicate
    * keeps the same selectivity at every SF — an absolute share threshold
    * empties as |parts| grows). The scalar (total, count) is the per-part
    * aggregate RE-AGGREGATED: both branches consume the identical
    * scan→partial-agg→exchange subtree, so Catalyst's ReuseExchange
    * computes the expensive part once and the denominator branch reads
    * the shuffled 16-byte/part frame (this is the exchange-reuse form the
    * round-7 tfidf fight established; the alternative — an unpartitioned
    * window over the |parts| census — single-tasks a fact-scaled frame).
    * The 1-row total then BROADCASTS into the share projection; the
    * threshold compares DOUBLES derived from exact decimals (a
    * decimal·decimal product would overflow DuckDB's 38-digit cap). */
  def q11Concentration(s: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("partkey"))
      .agg(sum(rev).as("r"))
    val total = perPart.agg(sum(col("r")).as("tot"), count(lit(1)).as("n_parts"))
    perPart
      .crossJoin(broadcast(total))
      .filter(col("r").cast("double") >
        col("tot").cast("double") / col("n_parts").cast("double") * 1.5)
      .select(
        col("partkey"),
        col("r").cast("double").as("revenue"),
        round(col("r").cast("double") / col("tot").cast("double") * 100.0, 4).as("pct_of_total"))
      .orderBy(col("revenue").desc, col("partkey"))
      .limit(50)
  }

  val q11ConcentrationSql: String =
    s"""WITH per_part AS (
         SELECT l_partkey AS partkey, SUM($revSql) AS r
         FROM lineitem GROUP BY 1),
       tot AS (SELECT SUM(r) AS tot, COUNT(*) AS n_parts FROM per_part)
       SELECT partkey, CAST(r AS DOUBLE) AS revenue,
              ROUND(CAST(r AS DOUBLE) / CAST(tot AS DOUBLE) * 100.0, 4) AS pct_of_total
       FROM per_part, tot
       WHERE CAST(r AS DOUBLE) > CAST(tot AS DOUBLE) / CAST(n_parts AS DOUBLE) * 1.5
       ORDER BY revenue DESC, partkey
       LIMIT 50"""

  /** TPC-H Q13's shape: the order-count DISTRIBUTION over customers,
    * zero-order customers included — the left-outer + double-aggregation
    * idiom. The order-side filter ("ignore low-priority orders") lives in
    * the JOIN CONDITION, not a WHERE: a WHERE after a left join silently
    * deletes the zero-order customers the query exists to count.
    *
    * Scale shape: shuffle left join on custkey, per-customer count
    * (partial agg), then a second tiny shuffle on the count value —
    * output is |distinct counts| rows. */
  def q13CustDist(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_custkey"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") =!= "5-LOW")
      .select(col("o_custkey"), col("o_orderkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13CustDistSql: String =
    """WITH per_cust AS (
         SELECT c_custkey, COUNT(o_orderkey) AS c_count
         FROM customer
         LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
         GROUP BY 1)
       SELECT c_count, COUNT(*) AS custdist
       FROM per_cust GROUP BY 1
       ORDER BY custdist DESC, c_count DESC"""

  /** TPC-H Q14's shape: promo revenue share for one month — a
    * share-of-scan conditional aggregate collapsing to ONE row. The
    * month filter prunes at the lineitem scan; the part join is a
    * fact-scaled shuffle join (part grows with SF — no broadcast hint,
    * AQE decides; at dev scale it broadcasts itself). */
  def q14PromoShare(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= "1997-09-01" && col("l_shipdate") < "1997-10-01")
      .select(col("l_partkey"), rev.as("r"))
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_type"))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("r")).otherwise(dec(lit(0), 14, 2))).as("pr"),
        sum(col("r")).as("tot"),
        count(lit(1)).as("n_items"))
      .select(
        round(col("pr").cast("double") * 100.0 / col("tot").cast("double"), 4)
          .as("promo_pct"),
        col("pr").cast("double").as("promo_revenue"),
        col("tot").cast("double").as("total_revenue"),
        col("n_items"))
  }

  val q14PromoShareSql: String =
    s"""SELECT ROUND(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $revSql
                                  ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE) * 100.0
                    / CAST(SUM($revSql) AS DOUBLE), 4) AS promo_pct,
              CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $revSql
                            ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE) AS promo_revenue,
              CAST(SUM($revSql) AS DOUBLE) AS total_revenue,
              COUNT(*) AS n_items
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'"""

  /** TPC-H Q15's shape: the top supplier(s) of 1996-Q1 — argmax via a
    * 1-row max re-aggregated from the per-supplier frame (the q11
    * exchange-reuse form: both branches share one scan+exchange) and
    * broadcast back as an equality filter, so EVERY tied supplier
    * surfaces (the argmax contract; a LIMIT 1 would drop ties).
    * Supplier dim joins after the cut — at that point the filtered frame
    * is ≤ handful of rows. The explicit suppkey NOT-NULL at the base is
    * load-bearing twice over: semantically it keeps an unattributed-lines
    * group out of the max, and physically it makes both branches' scan
    * filters IDENTICAL — without it the join back infers
    * isnotnull(l_suppkey) on one branch only and the specialized scans
    * defeat exchange reuse (the round-7 tfidf lesson). */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01" &&
        col("l_suppkey").isNotNull)
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(sum(rev).as("r"))
    val best = perSupp.agg(max(col("r")).as("best"))
    perSupp
      .crossJoin(broadcast(best))
      .filter(col("r") === col("best"))
      .join(Tables.supplier(s, dir), col("suppkey") === col("s_suppkey"))
      .select(col("suppkey"), col("s_name").as("supplier_name"),
        col("r").cast("double").as("total_revenue"))
      .orderBy("suppkey")
  }

  val q15TopSupplierSql: String =
    s"""WITH per_supp AS (
         SELECT l_suppkey AS suppkey, SUM($revSql) AS r
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
           AND l_suppkey IS NOT NULL
         GROUP BY 1)
       SELECT suppkey, s_name AS supplier_name, CAST(r AS DOUBLE) AS total_revenue
       FROM per_supp JOIN supplier ON suppkey = s_suppkey
       WHERE r = (SELECT MAX(r) FROM per_supp)
       ORDER BY suppkey"""

  /** TPC-H Q17's shape: revenue lost to small-quantity Brand#1 orders —
    * the correlated scalar subquery (`avg qty of THIS part`) decorrelated
    * to a PARTITIONED WINDOW over the partkey frame: one shuffle, no
    * join-back, no second scan (the aggregate-and-join-back form plans
    * the brand join twice). The per-part average is sum(DECIMAL)/count —
    * exact integers into one double division, so the 20% threshold
    * compares identical doubles in both engines. */
  def q17SmallQty(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#1")
      .select(col("p_partkey"))
    val l = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val byPart = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty",
        (sum(dec(col("l_quantity"), 18, 2)).over(byPart).cast("double")
          / count(lit(1)).over(byPart).cast("double")))
      .filter(col("l_quantity") < col("avg_qty") * 0.2)
      .agg(
        (sum(dec(col("l_extendedprice"), 14, 2)).cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  val q17SmallQtySql: String =
    """WITH b AS (
         SELECT l_quantity, l_extendedprice,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_partkey) AS DOUBLE)
                / CAST(COUNT(*) OVER (PARTITION BY l_partkey) AS DOUBLE) AS avg_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_brand = 'Brand#1')
       SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / 7.0 AS avg_yearly,
              COUNT(*) AS n_small
       FROM b WHERE l_quantity < avg_qty * 0.2"""

  /** TPC-H Q19's shape: an OR of three (brand, size-range, qty-range)
    * brackets — the disjunctive-pushdown stress test. The qty/size
    * bounds keep the OR referencing BOTH sides, so the planner must
    * split it: the single-side residuals (qty ≤ 36, size ≤ 15) are
    * derivable and the join stays an equi-join on partkey with the
    * disjunction as a post-join filter — never a nested-loop. One row
    * out: revenue + per-bracket counts (conditional aggregates). */
  def q19Brackets(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"), rev.as("r"))
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_brand"), col("p_size"))
    val b1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
      col("l_quantity").between(1, 11)
    val b2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
      col("l_quantity").between(10, 20)
    val b3 = col("p_brand") === "Brand#15" && col("p_size").between(1, 15) &&
      col("l_quantity").between(26, 36)
    l.join(p, col("l_partkey") === col("p_partkey"))
      .filter(b1 || b2 || b3)
      .agg(
        sum(col("r")).cast("double").as("revenue"),
        sum(b1.cast("long")).as("n_b1"),
        sum(b2.cast("long")).as("n_b2"),
        sum(b3.cast("long")).as("n_b3"))
  }

  val q19BracketsSql: String =
    s"""SELECT CAST(SUM($revSql) AS DOUBLE) AS revenue,
              CAST(SUM(CASE WHEN p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                        AND l_quantity BETWEEN 1 AND 11 THEN 1 ELSE 0 END) AS BIGINT) AS n_b1,
              CAST(SUM(CASE WHEN p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                        AND l_quantity BETWEEN 10 AND 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_b2,
              CAST(SUM(CASE WHEN p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
                        AND l_quantity BETWEEN 26 AND 36 THEN 1 ELSE 0 END) AS BIGINT) AS n_b3
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 26 AND 36)"""

  /** TPC-H Q22's shape: above-average-balance customers who never placed
    * an URGENT order — a scalar-subquery threshold (average POSITIVE
    * balance, a 1-row broadcast) plus a LEFT ANTI join against the
    * urgent-filtered orders, rolled up by market segment. ("Never ordered
    * at all" is empty on this data — every customer orders — so the
    * priority filter is what gives the anti join a real complement.)
    * The threshold branch re-scans customer (2 narrow columns, map-side
    * collapse to one row) — at 100 TB that second scan is the cheap
    * part; the anti join is the shuffle and AQE handles it. */
  def q22IdleRich(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val thresh = c.filter(col("c_acctbal") > 0.0)
      .agg((sum(dec(col("c_acctbal"), 18, 2)).cast("double")
        / count(lit(1)).cast("double")).as("avg_bal"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    c.crossJoin(broadcast(thresh))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(
        count(lit(1)).as("n_custs"),
        sum(dec(col("c_acctbal"), 18, 2)).cast("double").as("total_bal"))
      .orderBy("segment")
  }

  val q22IdleRichSql: String =
    """WITH t AS (
         SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE) AS avg_bal
         FROM customer WHERE c_acctbal > 0.0)
       SELECT c_mktsegment AS segment, COUNT(*) AS n_custs,
              CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
       FROM customer, t
       WHERE c_acctbal > avg_bal
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
       GROUP BY 1
       ORDER BY segment"""

  /** TPC-H Q16's shape: supplier-variety census per (brand, size) with
    * BOTH exclusion (NOT IN brand blacklist) and inclusion (IN size
    * list) predicates pushed to the part scan, then a COUNT(DISTINCT)
    * over the fact join — the distinct-aggregate-after-join pattern
    * (Spark plans it as a two-phase partial/merge distinct aggregate:
    * the shuffle carries (brand, size, suppkey) distinct triples, never
    * raw lineitems). 140 census rows at any SF (bounded by
    * brands × sizes); top-40 TakeOrdered cut. */
  def q16SupplierVariety(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(!col("p_brand").isin("Brand#5", "Brand#15", "Brand#25") &&
        col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), col("p_size").as("size"))
      .agg(countDistinct(col("l_suppkey")).as("n_supps"), count(lit(1)).as("n_lines"))
      .orderBy(col("n_supps").desc, col("brand"), col("size"))
      .limit(40)
  }

  val q16SupplierVarietySql: String =
    """SELECT p_brand AS brand, p_size AS size,
              COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_lines
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE p_brand NOT IN ('Brand#5', 'Brand#15', 'Brand#25')
         AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
       GROUP BY 1, 2
       ORDER BY n_supps DESC, brand, size
       LIMIT 40"""

  /** TPC-H Q3's shape: top-10 highest-revenue UNSHIPPED orders for one
    * market segment — the two-sided date window (ordered before D,
    * shipped after D) with both halves pushed to their own scans, a
    * three-table join, and a partial top-k over the per-order aggregate.
    * Completes the shipping-priority family (q4 is its EXISTS sibling).
    *
    * Scale shape: segment filter prunes customer before the join; both
    * date filters reach their parquet scans (PushedFilters); per-order
    * aggregate is map-side partial; top-10 is TakeOrdered. */
  def q3Unshipped(s: SparkSession, dir: String): DataFrame = {
    val d = "1997-01-01"
    val c = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") < d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > d)
      .select(col("l_orderkey"), rev.as("r"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("r")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
  }

  val q3UnshippedSql: String =
    s"""SELECT l_orderkey, CAST(SUM($revSql) AS DOUBLE) AS revenue,
              o_orderdate, o_orderpriority
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1997-01-01'
         AND l_shipdate  > TIMESTAMP '1997-01-01'
       GROUP BY l_orderkey, o_orderdate, o_orderpriority
       ORDER BY revenue DESC, l_orderkey
       LIMIT 10"""

  /** TPC-H Q4's shape: per-priority census of one quarter's orders that
    * have AT LEAST ONE slow lineitem (shipped > 30 days after the order
    * date) — the correlated EXISTS decorrelated to a LEFT SEMI join
    * whose condition spans both sides (l_shipdate vs o_orderdate + 30).
    * Q4 proper tests commit vs receipt dates this schema doesn't carry;
    * the ship-lag rendering keeps the plan shape (semi join + bounded
    * census) and the q21 lateness convention.
    *
    * Scale shape: the quarter filter prunes orders at the scan; the semi
    * join shuffles on orderkey and emits each order at most once (never
    * a row per matching lineitem); census bounded at 5 priorities. */
  def q4PriorityExists(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
    // interval, not date_add: date_add truncates the timestamp to DATE,
    // silently moving the boundary to midnight when a timestamp carries a
    // time of day — the q21 lateness convention, kept oracle-identical
    o.join(
        l,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("priority")
  }

  val q4PriorityExistsSql: String =
    """SELECT o_orderpriority AS priority, COUNT(*) AS n_orders
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate <  TIMESTAMP '1996-04-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
       GROUP BY 1
       ORDER BY priority"""

  /** TPC-H Q6's shape: the one-row forecasting-revenue-change aggregate —
    * THE predicate-pushdown benchmark: a single lineitem scan with a
    * year + discount-band + quantity filter and one conditional-free
    * sum, nothing else. Every filter must reach PushedFilters; the
    * aggregate is a map-side partial collapsing to one row.
    *
    * Exactness: the discount literals parse to the identical float64 in
    * both engines, so the band admits identical rows; the summed product
    * is exact decimal×decimal, one double cast at the end. */
  def q6Forecast(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
          col("l_quantity") < 25)
      .agg(
        sum(dec(col("l_extendedprice"), 14, 2) * dec(col("l_discount"), 4, 2))
          .cast("double")
          .as("revenue_effect"),
        count(lit(1)).as("n_lines"))
  }

  val q6ForecastSql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) *
                       CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue_effect,
              COUNT(*) AS n_lines
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount >= 0.02 AND l_discount <= 0.04
         AND l_quantity < 25"""

  /** TPC-H Q9's shape: product-line PROFIT per (supplier nation, order
    * year) — the name-substring part filter, the widest star join of the
    * suite (lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ orders), and a DERIVED
    * measure combining columns of two tables. Q9 proper subtracts
    * ps_supplycost·quantity; this schema has no partsupp, so the cost
    * model is the declared `quantity · p_retailprice / 2` — the shape
    * (revenue minus a part-priced cost) is what's exercised.
    *
    * Exactness: profit is summed as the exact decimal `2·rev − qty·retail`
    * and halved in ONE double division at the end — decimal halving
    * rounds differently across engines, integer-doubling doesn't.
    *
    * Scale shape: the name filter prunes part before the fact join; the
    * 25-row nation broadcast rides supplier; census bounded at
    * 25·|years|; everything else is AQE's fact-fact shuffles. */
  def q9Profit(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_name").contains("red"))
      .select(col("p_partkey"), col("p_retailprice"))
    val l = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), rev.as("r"))
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(s, dir)
      .select(col("n_nationkey"), col("n_name").as("nation"))
    val profit2 =
      dec(lit(2), 4, 2) * col("r") -
        dec(col("l_quantity"), 12, 2) * dec(col("p_retailprice"), 12, 2)
    l.join(p, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("nation", "o_year")
      .agg(
        (sum(profit2).cast("double") / 2.0d).as("profit"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9ProfitSql: String =
    s"""SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
              CAST(SUM(CAST(2 AS DECIMAL(4,2)) * $revSql
                       - CAST(l_quantity AS DECIMAL(12,2))
                         * CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / 2.0
                AS profit,
              COUNT(*) AS n_lines
       FROM lineitem
       JOIN part     ON l_partkey = p_partkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation   ON s_nationkey = n_nationkey
       JOIN orders   ON l_orderkey = o_orderkey
       WHERE p_name LIKE '%red%'
       GROUP BY 1, 2
       ORDER BY nation, o_year DESC"""

  /** TPC-H Q12's shape: per-class two-way PRIORITY census of one year's
    * late shipments — the join-then-pivot-by-condition pattern: each
    * (status, order) line contributes to exactly one of two conditional
    * counts (critical = 1-URGENT/2-HIGH vs everything else). Q12 proper
    * classes by l_shipmode this schema doesn't carry; l_linestatus keys
    * the census, the ship-lag predicate (shipped > 14 days after order)
    * supplies Q12's lateness semantics.
    *
    * Scale shape: year filter at the lineitem scan, one orderkey shuffle
    * join, conditional counts collapse map-side to ≤ |statuses| rows. */
  def q12LateClass(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
      .select(col("l_orderkey"), col("l_linestatus"), col("l_shipdate"))
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 14 DAYS"))
      .groupBy(col("l_linestatus").as("linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("critical_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("regular_count"))
      .orderBy("linestatus")
  }

  val q12LateClassSql: String =
    """SELECT l_linestatus AS linestatus,
              CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS critical_count,
              CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS regular_count
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_shipdate > o_orderdate + INTERVAL 14 DAY
       GROUP BY 1
       ORDER BY linestatus"""

  /** TPC-H Q20's plan skeleton adapted to this schema ("potential part
    * promotion" — canonical Q20 correlates partsupp availability with
    * shipped quantity; this schema carries no partsupp, so the
    * EXCESS-SHIPPER adaptation keeps the skeleton: a name-filtered part
    * dim, a date-windowed per-(supplier, part) shipment aggregate, a
    * correlated per-part threshold, and the supplier → nation join
    * chain): suppliers that shipped MORE THAN HALF of some red part's
    * 1995 volume — the "who really carries this part" census. Dominance
    * is the exact integer test 2·q > total (never a float share); the
    * reported best share is exact integer ppm (q·10⁶ DIV total, both
    * non-negative so DIV and `//` agree).
    *
    * Scale shape: the name-filtered part dim broadcasts; the fact scan
    * aggregates PARTIAL to (supplier, part); the per-part totals
    * re-aggregate that bounded frame — plan-pinned ReuseExchange, never
    * a second fact scan; supplier and nation are broadcast dims; output
    * ∝ suppliers (bounded), inline deterministic order. */
  def q20ExcessShippers(s: SparkSession, dir: String): DataFrame = {
    val tp = Tables.part(s, dir).filter(col("p_name").like("red%")).select(col("p_partkey"))
    val sh = Tables
      .lineitem(s, dir)
      .filter(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") < "1996-01-01")
      .join(broadcast(tp), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(floor(col("l_quantity")).cast("long")).as("q"))
    val tot = sh.groupBy("l_partkey").agg(sum(col("q")).as("t"))
    sh.join(tot, "l_partkey")
      .filter(col("q") * 2 > col("t"))
      .groupBy("l_suppkey")
      .agg(
        count(lit(1)).as("n_dominated"),
        max(expr("q * 1000000 DIV t")).as("max_share_ppm"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(
        col("s_suppkey").as("suppkey"),
        col("s_name"),
        col("n_name"),
        col("n_dominated"),
        col("max_share_ppm"))
      .orderBy("suppkey")
  }

  val q20ExcessShippersSql: String =
    """WITH tp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
       sh AS (SELECT l_suppkey, l_partkey,
                     CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS q
              FROM lineitem JOIN tp ON l_partkey = p_partkey
              WHERE l_shipdate >= TIMESTAMP '1995-01-01'
                AND l_shipdate < TIMESTAMP '1996-01-01'
              GROUP BY 1, 2),
       tot AS (SELECT l_partkey, SUM(q) AS t FROM sh GROUP BY 1),
       dom AS (SELECT l_suppkey,
                      CAST(COUNT(*) AS BIGINT) AS n_dominated,
                      CAST(MAX(q * 1000000 // t) AS BIGINT) AS max_share_ppm
               FROM sh JOIN tot USING (l_partkey)
               WHERE 2 * q > t
               GROUP BY 1)
       SELECT s_suppkey AS suppkey, s_name, n_name, n_dominated, max_share_ppm
       FROM dom
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       ORDER BY suppkey"""

  /** TPC-H Q2's plan skeleton adapted ("minimum-cost supplier" —
    * canonical Q2 reads partsupp supply cost; without partsupp, unit
    * price observed in shipments plays the cost: for every size-15
    * part, WHICH supplier ships it cheapest per unit, with the
    * supplier → nation → region chain attached — the min-per-group
    * correlated-subquery skeleton). Unit price is the exact integer
    * micro-dollar floor (Σ cents·10⁴ DIV Σ qty over the supplier's
    * shipments of that part — floor division is monotone, so the
    * argmin over (price_micro, suppkey) is deterministic and
    * cross-engine; both operands non-negative). One struct-min
    * aggregate per part — no window, no self-join.
    *
    * Scale shape: part dim filtered + broadcast; fact aggregates
    * partial to (part, supplier); the argmin is a map-side-combinable
    * min(struct) on the part key; supplier/nation/region broadcast.
    * Output ∝ filtered parts, inline deterministic order. */
  def q2MinPriceSupplier(s: SparkSession, dir: String): DataFrame = {
    val tp = Tables.part(s, dir).filter(col("p_size") === 15)
      .select(col("p_partkey"), col("p_brand"))
    val perSupp = Tables
      .lineitem(s, dir)
      .filter(col("l_quantity") > 0)
      .join(broadcast(tp), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("p_brand"), col("l_suppkey"))
      .agg(
        sum(floor(col("l_extendedprice") * 100.0).cast("long")).as("sc"),
        sum(floor(col("l_quantity")).cast("long")).as("qt"))
      .select(
        col("l_partkey"),
        col("p_brand"),
        col("l_suppkey"),
        expr("sc * 10000 DIV qt").as("price_micro"))
    perSupp
      .groupBy(col("l_partkey").as("partkey"), col("p_brand"))
      .agg(min(struct(col("price_micro"), col("l_suppkey").as("suppkey"))).as("b"))
      .join(broadcast(Tables.supplier(s, dir)), col("b.suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(
        col("partkey"),
        col("p_brand"),
        col("b.suppkey").as("suppkey"),
        col("s_name"),
        col("n_name"),
        col("b.price_micro").as("price_micro"))
      .orderBy("partkey")
  }

  val q2MinPriceSupplierSql: String =
    """WITH tp AS (SELECT p_partkey, p_brand FROM part WHERE p_size = 15),
       ps AS (SELECT l_partkey, p_brand, l_suppkey,
                     CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) * 10000
                          // SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS price_micro
              FROM lineitem JOIN tp ON l_partkey = p_partkey
              WHERE l_quantity > 0
              GROUP BY 1, 2, 3),
       best AS (SELECT l_partkey AS partkey, p_brand, l_suppkey AS suppkey, price_micro,
                       ROW_NUMBER() OVER (PARTITION BY l_partkey
                                          ORDER BY price_micro, l_suppkey) AS rk
                FROM ps)
       SELECT partkey, p_brand, suppkey, s_name, n_name, price_micro
       FROM best
       JOIN supplier ON suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       WHERE rk = 1
       ORDER BY partkey"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_excess_shippers" -> (q20ExcessShippers _),
    "q2_min_price_supplier" -> (q2MinPriceSupplier _),
    "q3_unshipped" -> (q3Unshipped _),
    "q4_priority_exists" -> (q4PriorityExists _),
    "q6_forecast" -> (q6Forecast _),
    "q9_profit" -> (q9Profit _),
    "q12_late_class" -> (q12LateClass _),
    "q16_supplier_variety" -> (q16SupplierVariety _),
    "q7_nation_flow" -> (q7NationFlow _),
    "q8_mkt_share" -> (q8MktShare _),
    "q10_returned" -> (q10Returned _),
    "q11_concentration" -> (q11Concentration _),
    "q13_cust_dist" -> (q13CustDist _),
    "q14_promo_share" -> (q14PromoShare _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q17_small_qty" -> (q17SmallQty _),
    "q19_brackets" -> (q19Brackets _),
    "q22_idle_rich" -> (q22IdleRich _))

  val oracles: Map[String, String] = Map(
    "q20_excess_shippers" -> q20ExcessShippersSql,
    "q2_min_price_supplier" -> q2MinPriceSupplierSql,
    "q3_unshipped" -> q3UnshippedSql,
    "q4_priority_exists" -> q4PriorityExistsSql,
    "q6_forecast" -> q6ForecastSql,
    "q9_profit" -> q9ProfitSql,
    "q12_late_class" -> q12LateClassSql,
    "q16_supplier_variety" -> q16SupplierVarietySql,
    "q7_nation_flow" -> q7NationFlowSql,
    "q8_mkt_share" -> q8MktShareSql,
    "q10_returned" -> q10ReturnedSql,
    "q11_concentration" -> q11ConcentrationSql,
    "q13_cust_dist" -> q13CustDistSql,
    "q14_promo_share" -> q14PromoShareSql,
    "q15_top_supplier" -> q15TopSupplierSql,
    "q17_small_qty" -> q17SmallQtySql,
    "q19_brackets" -> q19BracketsSql,
    "q22_idle_rich" -> q22IdleRichSql)
}
