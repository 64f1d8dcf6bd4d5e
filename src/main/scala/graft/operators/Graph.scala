package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the near-duplicate relation — the step past
  * [[Dedup.dedupClusters]]'s "which docs are connected" to "which docs are
  * CENTRAL": a template cluster's hub page outranks its thousand spokes,
  * which is exactly the doc a curator inspects (or keeps) first.
  *
  * The reference engine has no graph surface (main.py is flat SQL); this
  * extends the dedup family the way [[CorpusOps]] extends it — same shared
  * candidate-pair frame, a new question over it.
  */
object Graph {

  /** Total fixed-point rank mass: ranks are BIGINT micro-units of this
    * scale, so every operation is integer arithmetic — exact, associative,
    * order-independent — and both engines produce bit-identical ranks. */
  private val Scale = 1000000000000L // 10^12

  /** The near-dup pair list (Jaccard ≥ 0.5 over the shared cached
    * candidate frame) — ONE Scala definition of the graph's edge source
    * for [[pagerank]], [[triangles]] and [[linkPredict]], mirroring
    * [[nearGraphCtesSql]] on the oracle side, so a gate change can never
    * desynchronize one operator's graph from the others'. */
  private def nearPairs(s: SparkSession, dir: String): DataFrame =
    Dedup
      .ngramPairs(s, dir)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b")

  /** Symmetrized edge list over [[nearPairs]]' canonical pairs. */
  private def symEdges(pairs: DataFrame): DataFrame =
    pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))

  /** Node degrees over a symmetrized edge list. */
  private def degrees(sym: DataFrame): DataFrame =
    sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))

  private val ItersDefault = 3

  /** Iteration count — a validated session knob
    * (`spark.graft.graph.pagerankIters`, default 3; the oracle pins the
    * default, the curate-policy convention). The loop is UNROLLED into
    * the lineage, which doubles per round — fine to ~5; past that,
    * checkpoint per round like [[Dedup.dedupClusters]] before raising
    * the cap. The hard cap keeps an accidental `iters=50` from planning
    * a 2^50-node lineage. */
  private[operators] def pagerankIters(s: SparkSession): Int = {
    val raw = s.conf.get("spark.graft.graph.pagerankIters", ItersDefault.toString)
    val n =
      try raw.toInt
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"spark.graft.graph.pagerankIters must be a positive integer, got '$raw'")
      }
    require(n > 0 && n <= 8,
      s"spark.graft.graph.pagerankIters must be in [1, 8] (unrolled lineage doubles per round), got $n")
    n
  }

  /** PageRank (damping 0.85, [[pagerankIters]] unrolled iterations,
    * default 3) over the near-dup
    * graph: nodes = documents in ≥ 1 Jaccard-≥0.5 pair (the
    * [[Dedup.corpusDedupNg]] relation, symmetrized), edges undirected.
    * Isolated documents never receive or donate mass — their rank is the
    * constant base term after iteration 1 — so the report covers graph
    * nodes only (the near-dup neighborhoods a curator actually triages).
    *
    * EXACT cross-engine semantics is the design constraint — floating
    * PageRank is summation-order-dependent and can never hash-match
    * across engines, so ranks live in BIGINT micro-units (1e12 = total
    * mass 1.0) and every step is integer arithmetic:
    *   base = Scale DIV N;  contrib(u) = r(u) DIV deg(u)
    *   r'(v) = (15·base) DIV 100 + (85·Σ_{u→v} contrib(u)) DIV 100
    * Integer addition is associative, so partition order can't change the
    * sums; DIV (truncation) matches DuckDB's `//` (floor) on the
    * all-positive domain. The dangling/rounding residue simply leaks mass
    * (ranks are relative scores, not a distribution) — the standard
    * simplification, stated rather than hidden.
    *
    * Scale shape: the corpus appears ONLY as the shared cached pair frame
    * ([[Dedup.ngramPairs]] — hot-key-bounded candidate pairs, orders of
    * magnitude smaller than the corpus) and one eager count-only job for
    * N, folded in as a literal (a lazy 1-row N frame would be replicated
    * 2^iters times by the doubling lineage — the ScaleSpec pin). Each
    * iteration is one edge-key join plus one map-side-combined groupBy
    * over the EDGE frame — shuffle ∝ edges, never corpus. Degrees are
    * bounded in practice by the upstream rare-band candidate cap; AQE
    * splits any residual hub skew. Iterations: [[pagerankIters]]. */
  def pagerank(s: SparkSession, dir: String): DataFrame = {
    val edges = symEdges(nearPairs(s, dir))
    // N fetched EAGERLY (one O(1) count job, the globalRank/corpusShard
    // eager-literal discipline) rather than carried as a 1-row frame: the
    // iteration below references `cur` twice per round, so a lazy N
    // subtree would be replicated 2^Iters times in the lineage — 32
    // corpus count scans for 3 rounds (caught by the ScaleSpec pin). A
    // literal replicates for free; Scala's Long division truncates
    // exactly like DIV on the positive domain.
    val nDocs = Tables.documents(s, dir).count()
    // empty corpus ⇒ empty graph ⇒ empty output; base is never read
    val base = if (nDocs == 0) 0L else Scale / nDocs
    var cur = edges
      .groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
      .select(col("id"), col("deg"), lit(base).as("base"))
      .withColumn("r", col("base"))
    for (_ <- 1 to pagerankIters(s)) {
      val contrib = cur.select(col("id").as("src"), expr("r DIV deg").as("c"))
      val inc = edges
        .join(contrib, "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("c")).as("inc"))
      cur = cur
        .join(inc, Seq("id"), "left")
        .withColumn("r", expr("(15 * base) DIV 100 + (85 * coalesce(inc, 0)) DIV 100"))
        .drop("inc")
    }
    cur
      .select(col("id").as("doc_id"), col("deg"), col("r").as("score_micro"))
  }

  /** SQL twin: the shared rare-pair CTEs, the near relation, then the
    * three iterations unrolled (r0 → r1 → r2 → r3), each the literal SQL
    * rendering of the integer recurrence above. `//` is DuckDB integer
    * division (floor == Spark's DIV truncation on the positive domain);
    * the inc sum is CAST back to BIGINT because DuckDB SUM(BIGINT) is
    * HUGEINT. */
  val pagerankSql: String = {
    def step(prev: String, next: String): String =
      s"""$next AS (
         SELECT $prev.id, $prev.deg, $prev.base,
                (15 * $prev.base) // 100 + (85 * COALESCE(i.inc, 0)) // 100 AS r
         FROM $prev LEFT JOIN (
           SELECT e.dst AS id, CAST(SUM(c.r // c.deg) AS BIGINT) AS inc
           FROM edges e JOIN $prev c ON c.id = e.src GROUP BY 1) i USING (id))"""
    s"""WITH ${Dedup.rarePairCtesSql},
       near AS (
         SELECT doc_a, doc_b
         FROM inter
         WHERE n_inter / CAST(den AS DOUBLE) >= 0.5),
       edges AS (
         SELECT doc_a AS src, doc_b AS dst FROM near
         UNION ALL
         SELECT doc_b AS src, doc_a AS dst FROM near),
       nn AS (SELECT COUNT(*) AS n_docs FROM documents),
       r0 AS (
         SELECT src AS id, COUNT(*) AS deg,
                $Scale // n_docs AS base, $Scale // n_docs AS r
         FROM edges CROSS JOIN nn GROUP BY 1, 3, 4),
       ${step("r0", "r1")},
       ${step("r1", "r2")},
       ${step("r2", "r3")}
       SELECT id AS doc_id, deg, r AS score_micro
       FROM r3
       ORDER BY score_micro DESC, doc_id"""
  }

  /** Per-node triangle count + local clustering coefficient over the
    * near-dup graph — the "is this neighborhood one template family or
    * incidental overlap" signal: a boilerplate cluster is near-clique
    * (coefficient → 1), a hub page sharing disjoint snippets with many
    * unrelated docs is star-shaped (→ 0). All counting is exact integers;
    * the coefficient is one double division (NULL when deg < 2 — a
    * 1-neighbor node has no possible triangle, which is "undefined", not
    * "0.0").
    *
    * Scale shape — DEGREE-ORDERED orientation, the standard distributed
    * triangle count: each undirected edge is directed from its
    * (deg, id)-smaller endpoint, so wedges are enumerated only at each
    * triangle's LOWEST-degree apex — Σ deg_out² bounded by m^1.5 overall
    * instead of Σ deg² concentrating on hubs (a 10⁶-degree hub generates
    * zero wedges unless its neighbors are even hotter). The wedge join and
    * the closing semi-join shuffle on edge keys — ∝ edges + wedges, never
    * corpus — and each triangle lands exactly once before the explode back
    * to its three corners. */
  def triangles(s: SparkSession, dir: String): DataFrame = {
    val sym = symEdges(nearPairs(s, dir))
    val deg = degrees(sym)
    // orient low → high in the (deg, id) total order; ks/kd ride along so
    // the wedge dedup below needs no re-join
    val oriented = sym
      .join(deg.select(col("id").as("src"), col("deg").as("dsrc")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("ddst")), "dst")
      .filter(struct(col("dsrc"), col("src")) < struct(col("ddst"), col("dst")))
      .select(
        col("src"),
        col("dst"),
        struct(col("ddst"), col("dst")).as("kd"))
    val e1 = oriented.select(col("src").as("u"), col("dst").as("v"), col("kd").as("kv"))
    val e2 = oriented.select(col("src").as("u"), col("dst").as("w"), col("kd").as("kw"))
    // wedge (v, w) at apex u, each unordered pair once; the closing edge —
    // if present — is oriented v → w because kv < kw
    val tri = e1
      .join(e2, Seq("u"))
      .filter(col("kv") < col("kw"))
      .join(
        oriented.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"),
        "left_semi")
    val counts = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tri"))
    deg
      .join(counts, Seq("id"), "left")
      .select(
        col("id").as("doc_id"),
        col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round(
          when(
            col("deg") >= 2,
            (coalesce(col("n_tri"), lit(0L)) * 2).cast("double") /
              (col("deg") * (col("deg") - 1))),
          4).as("clustering"))
  }

  /** Oracle CTE chain `near → edges → deg` over [[Dedup.rarePairCtesSql]]:
    * the Jaccard-≥0.5 pair list, its symmetrized edge set, and node
    * degrees — ONE definition of the graph both [[trianglesSql]] and
    * [[linkPredictSql]] replay, so the two oracles can never disagree
    * about which graph they measure. */
  private val nearGraphCtesSql: String =
    """near AS (
         SELECT doc_a, doc_b
         FROM inter
         WHERE n_inter / CAST(den AS DOUBLE) >= 0.5),
       edges AS (
         SELECT doc_a AS src, doc_b AS dst FROM near
         UNION ALL
         SELECT doc_b AS src, doc_a AS dst FROM near),
       deg AS (SELECT src AS id, COUNT(*) AS deg FROM edges GROUP BY 1)"""

  /** SQL twin: id-order triangle enumeration (`a < b < c` over the
    * canonical pair list) — the SAME triangle set as the degree-ordered
    * plan (orientation changes join cost, never membership), in the
    * simplest SQL rendering. */
  val trianglesSql: String =
    s"""WITH ${Dedup.rarePairCtesSql},
       $nearGraphCtesSql,
       tri AS (
         SELECT p1.doc_a AS a, p1.doc_b AS b, p2.doc_b AS c
         FROM near p1
         JOIN near p2 ON p2.doc_a = p1.doc_b
         JOIN near p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b),
       tn AS (
         SELECT a AS id FROM tri
         UNION ALL SELECT b FROM tri
         UNION ALL SELECT c FROM tri),
       tc AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tri FROM tn GROUP BY 1)
       SELECT deg.id AS doc_id, deg.deg,
              COALESCE(tc.n_tri, 0) AS n_tri,
              ROUND(CASE WHEN deg.deg >= 2
                         THEN CAST(COALESCE(tc.n_tri, 0) * 2 AS DOUBLE)
                              / (deg.deg * (deg.deg - 1)) END, 4) AS clustering
       FROM deg LEFT JOIN tc USING (id)
       ORDER BY doc_id"""

  /** Link prediction over the near-dup graph — candidate EXPANSION, the
    * step after [[Dedup.dedupClusters]] answers "which docs are
    * connected": a document pair that shares near-dup neighbors but has
    * NO direct candidate pair is exactly the transitivity hole a banded
    * candidate generator can leave (two docs each similar to a common
    * template, their own pair falling just under the rare-band /
    * threshold gate). The top 20 such pairs by common-neighbor count —
    * with both endpoint degrees for triage — are the pairs a curator
    * (or a second, more expensive verifier) inspects next.
    *
    * All-integer scoring (common-neighbor count, degrees) with the full
    * deterministic order (n_common DESC, doc_a, doc_b), so the top-k cut
    * is tie-stable cross-engine.
    *
    * Scale shape: wedges are enumerated per apex over its neighbor list
    * (the `a < b` half), so cost is Σ deg² over PAIR-GRAPH nodes — the
    * graph the upstream df ∈ [2, 20] rare band already degree-bounds
    * (the [[pagerank]] argument; a 20-doc gram cap admits no hub), and
    * AQE splits residual skew. The wedge groupBy and the existing-edge
    * anti-join shuffle on pair keys ∝ wedges, never corpus; the final
    * top-20 is a TakeOrdered partial top-k, no global sort. */
  def linkPredict(s: SparkSession, dir: String): DataFrame = {
    val pairs = nearPairs(s, dir)
    val sym = symEdges(pairs)
    val deg = degrees(sym)
    val cand = sym
      .select(col("src").as("u"), col("dst").as("a"))
      .join(sym.select(col("src").as("u"), col("dst").as("b")), Seq("u"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n_common"))
      .join(
        pairs.select(col("doc_a").as("a"), col("doc_b").as("b")),
        Seq("a", "b"),
        "left_anti")
    cand
      .join(deg.select(col("id").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("deg_b")), "b")
      .select(
        col("a").as("doc_a"),
        col("b").as("doc_b"),
        col("n_common"),
        col("deg_a"),
        col("deg_b"))
      .orderBy(col("n_common").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** SQL twin: wedge counting as an edges self-join, the direct-pair
    * exclusion as NOT EXISTS over the canonical pair list. */
  val linkPredictSql: String =
    s"""WITH ${Dedup.rarePairCtesSql},
       $nearGraphCtesSql,
       wedge AS (
         SELECT e1.dst AS a, e2.dst AS b
         FROM edges e1 JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst),
       cand AS (
         SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_common
         FROM wedge w
         WHERE NOT EXISTS (SELECT 1 FROM near n WHERE n.doc_a = w.a AND n.doc_b = w.b)
         GROUP BY 1, 2)
       SELECT a AS doc_a, b AS doc_b, n_common, da.deg AS deg_a, db.deg AS deg_b
       FROM cand
       JOIN deg da ON da.id = cand.a
       JOIN deg db ON db.id = cand.b
       ORDER BY n_common DESC, doc_a, doc_b
       LIMIT 20"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (pagerank _),
    "graph_triangles" -> (triangles _),
    "graph_link_predict" -> (linkPredict _))

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> pagerankSql,
    "graph_triangles" -> trianglesSql,
    "graph_link_predict" -> linkPredictSql)
}
