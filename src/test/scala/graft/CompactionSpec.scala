package graft

import graft.sources.Compaction
import org.apache.spark.sql.functions._

/** Store-compaction contracts: row-identical rewrite, file-count
  * collapse, conf restoration, and disjoint key ranges for the
  * clustered variant. */
class CompactionSpec extends GraftSpecBase {

  private def fragmented(tmp: String): String = {
    val src = s"$tmp/frag"
    spark.read
      .parquet(s"$sfDir/documents.parquet")
      .repartition(20)
      .write
      .parquet(src)
    src
  }

  test("compact: merges a fragmented store row-identically and restores read confs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val src = fragmented(tmp)
    val dst = s"$tmp/out"
    val prevMax = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    // tiny corpus + 1 GiB target -> the packer must collapse to ONE file
    val (nIn, nOut) = Compaction.compact(spark, src, dst, 1024L * 1024 * 1024)
    assert(nIn >= 10, s"fixture not fragmented: $nIn files")
    assert(nOut == 1, s"expected 1 packed file, got $nOut")
    val a = spark.read.parquet(src)
    val b = spark.read.parquet(dst)
    assert(a.count() == b.count())
    assert(a.except(b).isEmpty && b.except(a).isEmpty, "rewrite not row-identical")
    assert(spark.conf.getOption("spark.sql.files.maxPartitionBytes") == prevMax,
      "read conf leaked out of compact()")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("compact: a too-small target is rejected loudly") {
    intercept[IllegalArgumentException] {
      Compaction.compact(spark, "/nonexistent", "/tmp/x", 1024)
    }
  }

  test("compactClustered: disjoint per-file key ranges, sorted within files, row-identical") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cluster").toString
    val src = fragmented(tmp)
    val dst = s"$tmp/clustered"
    Compaction.compactClustered(spark, src, dst, "doc_id", 4)
    val a = spark.read.parquet(src)
    val b = spark.read.parquet(dst)
    assert(a.count() == b.count())
    assert(a.except(b).isEmpty && b.except(a).isEmpty, "rewrite not row-identical")
    // each output file covers a disjoint doc_id range -> a doc_id
    // predicate prunes to one file via parquet min/max stats
    val ranges = Compaction
      .fileKeyRanges(spark, dst, "doc_id")
      .collect()
      .map(r => (r.getAs[Long]("key_min"), r.getAs[Long]("key_max")))
      .sortBy(_._1)
    assert(ranges.length > 1, "fixture too small to produce multiple files")
    for (Seq((_, hi), (lo2, _)) <- ranges.toSeq.sliding(2))
      assert(hi < lo2, s"overlapping file key ranges: $ranges")
    // rows are key-sorted within each file (row-group stats monotone)
    val disorder = spark.read
      .parquet(dst)
      .withColumn("f", input_file_name())
      .withColumn(
        "prev",
        lag("doc_id", 1).over(
          org.apache.spark.sql.expressions.Window.partitionBy("f").orderBy(monotonically_increasing_id())))
      .filter(col("prev") > col("doc_id"))
      .count()
    assert(disorder == 0, s"$disorder rows out of key order within files")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }
}
