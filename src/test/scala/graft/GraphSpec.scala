package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Independent reference for the exact integer PageRank: re-derive the
  * near-dup edge relation from raw text in plain Scala (string grams, the
  * rare df ∈ [2, 20] candidate band, full-gram-count Jaccard — the same
  * contract as the shared pair frame) and run the fixed-point recurrence
  * in a Map — no Spark, no shared code with the operator. */
class GraphSpec extends GraftSpecBase {

  /** The near-dup edge relation re-derived from raw text with string
    * grams (no shared code with the operator): rare-band candidate
    * discovery, full-gram-count Jaccard ≥ 0.5, adjacency as a Map. */
  private lazy val referenceAdj: Map[Long, Seq[Long]] = {
    val docs = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .collect()
      .flatMap(r => Option(r.getAs[String]("text")).map(t => r.getAs[Long]("doc_id") -> t))
    val gramSets: Map[Long, Set[String]] = docs.map { case (id, t) =>
      val words = t.trim.replaceAll(" +", " ").split(" ").filter(_.nonEmpty)
      val grams =
        if (words.length < 3) Set.empty[String]
        else words.sliding(3).map(_.mkString(" ")).toSet
      id -> grams
    }.toMap
    val df = gramSets.values.flatten
      .groupBy(identity)
      .map { case (g, occ) => g -> occ.size }
    val rare: Set[String] = df.collect { case (g, c) if c >= 2 && c <= 20 => g }.toSet
    val withGrams = gramSets.filter(_._2.nonEmpty).toSeq.sortBy(_._1)
    val edges = for {
      (a, ga) <- withGrams
      (b, gb) <- withGrams
      if a < b
      nInter = (ga & gb).count(rare)
      if nInter > 0
      if nInter.toDouble / (ga.size + gb.size - nInter) >= 0.5
    } yield (a, b)
    (edges.map(e => e._1 -> e._2) ++ edges.map(e => e._2 -> e._1))
      .groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
  }

  test("pagerank matches a brute-force integer reference on sf0.001") {
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val adj = referenceAdj
    val base = 1000000000000L / nDocs
    var r: Map[Long, Long] = adj.map { case (k, _) => k -> base }
    for (_ <- 1 to 3) {
      val contrib = adj.map { case (k, ns) => k -> r(k) / ns.size }
      r = adj.map { case (v, _) =>
        val inc = adj(v).map(contrib).sum
        v -> ((15 * base) / 100 + (85 * inc) / 100)
      }
    }
    val expected = adj.map { case (v, ns) => v -> (ns.size.toLong, r(v)) }

    val got = Graph
      .pagerank(spark, sfDir)
      .collect()
      .map(row =>
        row.getAs[Long]("doc_id") ->
          (row.getAs[Long]("deg"), row.getAs[Long]("score_micro")))
      .toMap
    assert(got.keySet == expected.keySet, "node sets differ")
    for ((id, exp) <- expected)
      assert(got(id) == exp, s"doc $id: got ${got(id)}, expected $exp")
  }

  test("triangles matches a brute-force reference on sf0.001") {
    val adj = referenceAdj
    val nbr: Map[Long, Set[Long]] = adj.map { case (k, v) => k -> v.toSet }
    val expected = adj.map { case (v, ns) =>
      val deg = ns.size
      val nTri = (for {
        a <- ns; b <- ns
        if a < b && nbr(a).contains(b)
      } yield 1).size
      val clustering =
        if (deg >= 2)
          Some(BigDecimal(2.0 * nTri / (deg.toLong * (deg - 1)))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        else None
      v -> (deg.toLong, nTri.toLong, clustering)
    }
    val got = graft.operators.Graph
      .triangles(spark, sfDir)
      .collect()
      .map { r =>
        r.getAs[Long]("doc_id") -> (
          (r.getAs[Long]("deg"),
            r.getAs[Long]("n_tri"),
            Option(r.getAs[java.lang.Double]("clustering")).map(_.doubleValue)))
      }
      .toMap
    assert(got.keySet == expected.keySet, "node sets differ")
    for ((id, exp) <- expected)
      assert(got(id) == exp, s"doc $id: got ${got(id)}, expected $exp")
    // sanity: the fixture graph genuinely exercises triangles
    assert(expected.values.exists(_._2 > 0), "fixture has no triangles — test is vacuous")
  }

  test("link prediction matches a brute-force reference on sf0.001") {
    val adj = referenceAdj
    val nbr: Map[Long, Set[Long]] = adj.map { case (k, v) => k -> v.toSet }
    val nodes = adj.keys.toSeq.sorted
    val cands = for {
      a <- nodes; b <- nodes
      if a < b && !nbr(a).contains(b)
      cn = (nbr(a) & nbr(b)).size
      if cn > 0
    } yield (a, b, cn.toLong, nbr(a).size.toLong, nbr(b).size.toLong)
    val expected = cands.sortBy { case (a, b, cn, _, _) => (-cn, a, b) }.take(20)
    val got = Graph.linkPredict(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected.toSeq,
      s"link-predict drifted: got ${got.toSeq}, expected $expected")
  }

  test("hand-derived exact values on a planted path graph (1–2–3)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_graph_path").toString
    // J(1,2)=4/5, J(2,3)=4/7 ≥ 0.5; J(1,3)=3/7 < 0.5 → path, degs 1-2-1
    Seq(
      (1L, "a b c d e f", "en", "srcX", 11L),
      (2L, "a b c d e f g", "en", "srcX", 13L),
      (3L, "b c d e f g h i", "en", "srcX", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.conf.set("spark.graft.graph.pagerankIters", "1")
    try {
      // N=3 → base = 10^12 DIV 3 = 333333333333; (15·base) DIV 100 =
      // 49999999999; contribs: c1=c3=base, c2=base DIV 2 = 166666666666;
      // r(1)=r(3)= 49999999999 + (85·166666666666) DIV 100 = 191666666665
      // r(2)   = 49999999999 + (85·(2·base)) DIV 100     = 616666666665
      val pr = graft.operators.Graph.pagerank(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(pr == Map(1L -> 191666666665L, 2L -> 616666666665L, 3L -> 191666666665L),
        s"recurrence drifted from hand-derived constants: $pr")
    } finally {
      spark.conf.unset("spark.graft.graph.pagerankIters")
    }
    // triangles: a path has none; node 2 (deg 2) reports 0.0, leaves NULL
    val tri = graft.operators.Graph.triangles(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getAs[java.lang.Double]("clustering")))))
      .toMap
    assert(tri == Map(
      1L -> ((1L, 0L, None)),
      2L -> ((2L, 0L, Some(0.0: java.lang.Double))),
      3L -> ((1L, 0L, None))), s"triangle audit drifted: $tri")
    // link prediction: the path's one transitivity hole is (1, 3) through
    // their common neighbor 2 — the planted non-vacuous case (the driver
    // corpus's near-dup graph is clique-structured, so its census is
    // legitimately empty; this fixture is what pins the operator's logic)
    val lp = graft.operators.Graph.linkPredict(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(lp.toSeq == Seq((1L, 3L, 1L, 1L, 1L)), s"link prediction drifted: ${lp.toSeq}")
    graft.operators.Dedup.clearSharedCache()
  }

  test("pagerank mass is bounded; presentation order moved to the dump map") {
    val rows = Graph.pagerank(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // the operator returns UNSORTED per-doc scores (a global sort over
    // output ∝ corpus is presentation, not semantics); the driver dump's
    // (score desc, doc_id) order now lives in SparkEntry.presentationOrder
    assert(SparkEntry.presentationOrder.contains("graph_pagerank"),
      "graph_pagerank lost its dump presentation order")
    // each rank is positive and no node exceeds the total mass envelope
    assert(rows.forall(r => r.getAs[Long]("score_micro") > 0))
    assert(rows.map(_.getAs[Long]("score_micro")).sum <= 1000000000000L)
  }
}
