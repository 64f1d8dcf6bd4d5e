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

  test("compactZOrdered: row-identical, both dimensions prune; single-key leaves dim B unprunable") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    import spark.implicits._
    // 64k rows on a uniform 256x256 grid of two INDEPENDENT keys — the
    // adversarial case for single-key clustering (key B is pure noise
    // relative to key A's order)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 65536).map(i => (i.toLong, rnd.nextInt(65536).toLong, s"payload $i"))
    rows.toDF("ka", "kb", "payload").repartition(16)
      .write.parquet(s"$tmp/src")
    Compaction.compactZOrdered(spark, s"$tmp/src", s"$tmp/z", "ka", "kb", 16)
    Compaction.compactClustered(spark, s"$tmp/src", s"$tmp/single", "ka", 16)
    val a = spark.read.parquet(s"$tmp/src")
    val z = spark.read.parquet(s"$tmp/z")
    assert(a.count() == z.count())
    assert(a.except(z).isEmpty && z.except(a).isEmpty, "z-order rewrite not row-identical")
    // pruning geometry: count files whose [min,max] on a key overlaps a
    // 1/8 slice of its domain — what parquet row-group stats would scan
    def overlapping(path: String, key: String, lo: Long, hi: Long): Int =
      Compaction.fileKeyRanges(spark, path, key).collect().count { r =>
        r.getAs[Long]("key_min") <= hi && r.getAs[Long]("key_max") >= lo
      }
    val nz = spark.read.parquet(s"$tmp/z").inputFiles.length
    assert(nz >= 8, s"fixture produced too few z files to measure pruning: $nz")
    // EITHER dimension prunes to at most half the files under z-order
    assert(overlapping(s"$tmp/z", "ka", 0, 8191) <= nz / 2,
      "z-order fails to prune dimension A")
    assert(overlapping(s"$tmp/z", "kb", 0, 8191) <= nz / 2,
      "z-order fails to prune dimension B")
    // the single-key baseline: perfect on A, USELESS on B (every file
    // overlaps the B slice) — the gap compactZOrdered exists to close
    assert(overlapping(s"$tmp/single", "ka", 0, 8191) <= 3)
    val nSingle = spark.read.parquet(s"$tmp/single").inputFiles.length
    assert(overlapping(s"$tmp/single", "kb", 0, 8191) == nSingle,
      "expected the single-key layout to leave dim B unprunable")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }
}
