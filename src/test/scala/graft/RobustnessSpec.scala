package graft

import org.apache.spark.sql.functions._

/** Pathological-input sweep: every registered query must COMPLETE on a
  * corpus containing the degenerate document shapes a real crawl
  * delivers: NULL text, empty text, whitespace-only text, single-word
  * docs, a giant single token, NULL lang/source, and duplicate content
  * across the special sources the corpus-lifecycle operators key on
  * (src0 = eval, src19 = delta). The harness is deliberately STRICT —
  * any throw fails the sweep; none of this fixture's shapes should trip
  * an intentional guard (those fire on scale hazards, not data shape).
  * If a future fixture legitimately trips a documented loud guard, add
  * an explicit expected-failure entry rather than loosening the catch.
  * The driver-generated tables are clean by construction, so this is
  * the coverage they cannot give. */
class RobustnessSpec extends GraftSpecBase {

  private lazy val patDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pathological").toString
    // every non-documents table rides along unchanged (sf0.001)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings"))
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    import spark.implicits._
    val normal = (1 to 40).map { i =>
      (i.toLong, s"normal document number $i with several plain words inside",
        Seq("en", "de", "es", "fr", "zh")(i % 5), s"src${i % 20}", 48L)
    }
    val pathological = Seq(
      (100L, null.asInstanceOf[String], "en", "src1", 0L),   // NULL text
      (101L, "", "en", "src2", 0L),                          // empty text
      (102L, "   ", "en", "src3", 3L),                       // whitespace only
      (103L, "word", "en", "src4", 4L),                      // single word
      (104L, "two words", null, "src5", 9L),                 // NULL lang
      (105L, "three little words", "de", null, 18L),         // NULL source
      (106L, "x" * 5000, "en", "src6", 5000L),               // one giant token
      (107L, "normal document number 7 with several plain words inside",
        "en", "src0", 48L),                                  // eval dup of doc 7
      (108L, "normal document number 9 with several plain words inside",
        "en", "src19", 48L),                                 // delta dup of doc 9
      (109L, "eval only sentence for containment checks here", "en", "src0", 46L),
      (110L, "brand new delta content never seen before anywhere", "fr", "src19", 50L))
    (normal ++ pathological)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("every registered query survives a pathological corpus") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, Throwable)]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try { fn(spark, patDir).count(): Unit }
      catch { case t: Throwable => failures += ((name, t)) }
    }
    graft.operators.Dedup.clearSharedCache()
    assert(
      failures.isEmpty,
      failures.map { case (n, t) => s"$n: ${t.getClass.getSimpleName} ${t.getMessage}" }
        .mkString("queries crashed on pathological input:\n", "\n", ""))
  }
}
