package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-store compaction — the between-crawls maintenance job every
  * 100 TB parquet store eventually needs. Ingest (streaming sinks,
  * per-batch admission, task-parallel writers) fragments a table into
  * files far below the row-group size the readers want; every downstream
  * scan then pays per-file open cost and loses row-group parallelism
  * (the driver's own single-row-group sf tables are a live example —
  * SURVEY §7's "local job floor"). This object provides the two
  * Spark-first remedies:
  *
  *   - [[compact]]: merge small files to a target size with ZERO
  *     shuffle. The insight is that Spark's parquet reader already
  *     contains a bin-packing planner — `spark.sql.files
  *     .maxPartitionBytes` + `openCostInBytes` pack input files into
  *     read partitions of bounded byte size — so writing one output
  *     file per read partition IS the compaction, with no exchange in
  *     the plan. A hand-rolled first-fit planner would duplicate what
  *     the FilePartition packer does, worse.
  *   - [[compactClustered]]: compaction that also RANGE-CLUSTERS the
  *     table on a key (the sort-based half of what table formats call
  *     OPTIMIZE ... ZORDER for the single-key case): one
  *     repartitionByRange exchange + in-partition sort, so each output
  *     file covers a disjoint key range and parquet min/max row-group
  *     stats turn key predicates into file/row-group pruning. This one
  *     genuinely needs its shuffle — clustering is a data movement —
  *     and is the variant to run when the store's dominant read
  *     pattern filters on the key.
  *
  * Both write to a FRESH directory and leave the source untouched — at
  * scale the swap is a catalog/symlink flip (the stores' staged-swap
  * convention, [[graft.operators.GramIndex]]); rewriting in place would
  * race concurrent readers. Sizing note: `targetBytes` governs INPUT
  * bytes per output file; columnar re-encoding usually shrinks output
  * below it (ratios vary with the data), so pick the target from the
  * desired input coverage per file, not the on-disk output size.
  *
  * CompactionSpec pins: row-identical rewrite (both variants), output
  * file count collapsing to the packing bound, zero-exchange plan for
  * [[compact]], and pairwise-disjoint per-file key ranges for
  * [[compactClustered]].
  */
object Compaction {

  /** Zero-shuffle small-file compaction: rewrite `srcPath`'s parquet
    * under `dstPath` with ~`targetBytes` of input per output file.
    * Returns (input file count, output file count). */
  def compact(
      s: SparkSession,
      srcPath: String,
      dstPath: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes >= 1024 * 1024, s"targetBytes $targetBytes < 1 MiB is degenerate")
    val nIn = parquetFiles(srcPath).size
    // the packer confs are set on a CLONED session: newSession() shares
    // the SparkContext (executors, cached data) but owns a fresh SQLConf,
    // so the split sizing is scoped to this read's planning — an
    // unrelated query planned concurrently on `s` never inherits it
    // (the previously documented save/restore residual hazard, now
    // structurally gone; nothing to restore, the clone is discarded).
    val scoped = s.newSession()
    // newSession() starts from the LAUNCH-time conf only — carry the
    // caller's runtime SQL confs over (compression codec, corrupt-file
    // policy, …) so the rewrite behaves exactly like the caller's own
    // session everywhere except the three packer knobs. Static/readonly
    // entries refuse the set; skip them (they are already inherited).
    s.conf.getAll.foreach { case (k, v) =>
      try scoped.conf.set(k, v)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    scoped.conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
    // open cost inflates each file's packed size; against MANY tiny
    // files the default 4 MiB would cap packing at ~32 files/partition
    // regardless of bytes — 64 KiB keeps the byte target in charge
    // while still discouraging pathological thousand-file partitions
    scoped.conf.set("spark.sql.files.openCostInBytes", (64 * 1024).toString)
    // the packer shrinks split size to totalBytes/defaultParallelism to
    // manufacture parallelism — right for queries, wrong here: it would
    // re-fragment a small store to one file per core. Pin the floor to
    // 1 so the byte target alone decides the output file count.
    scoped.conf.set("spark.sql.files.minPartitionNum", "1")
    scoped.read.parquet(srcPath).write.mode(SaveMode.Overwrite).parquet(dstPath)
    (nIn, parquetFiles(dstPath).size)
  }

  /** Compaction + single-key range clustering: `nFiles` output files,
    * each covering a disjoint `key` range, rows sorted by `key` within
    * each file so row-group min/max stats prune key predicates. */
  def compactClustered(
      s: SparkSession,
      srcPath: String,
      dstPath: String,
      key: String,
      nFiles: Int): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    s.read
      .parquet(srcPath)
      .repartitionByRange(nFiles, col(key))
      .sortWithinPartitions(key)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(dstPath)
  }

  /** Compaction + TWO-key Z-order clustering — the multi-column half of
    * what table formats call OPTIMIZE ... ZORDER: rows are range-
    * clustered on the Morton interleave of the two keys' normalized
    * ranks, so each output file covers a small RECTANGLE of
    * (keyA, keyB) space and parquet min/max stats prune predicates on
    * EITHER column ([[compactClustered]] prunes only its one sort key;
    * its second-position column degrades to nothing). With n output
    * files a selective slice on one dimension touches ~√n of them
    * instead of all n — the classic Z-order trade: neither column gets
    * single-key-perfect pruning, both get usable pruning.
    *
    * Mechanics: one tiny min/max agg per key (2 values each, driver-
    * fetched), each key normalized to a ≤16-bit lattice position by an
    * exact power-of-two down-shift in UNSIGNED key order (no multiply —
    * a `(x−min)·65535` rescale would overflow LONG for wide-span keys,
    * and even plain `x−min` overflows for full-range hash keys; see the
    * lattice comment), the two
    * 16-bit words bit-spread and interleaved into one 32-bit z-value
    * with five shift-mask steps each (the standard Morton spread — all
    * codegen'd column arithmetic, no UDF), then range-partition + sort
    * on z, written WITHOUT the helper column. NULLs in either key sort
    * to lattice position 0 (coalesce to min), keeping them clustered in
    * one corner rather than scattered. Numeric keys only (the lattice
    * needs a metric); both keys are read as BIGINT.
    *
    * CompactionSpec pins: row-identical rewrite, and the pruning
    * geometry itself — per-file rectangles tight enough that a 1/8
    * slice on EITHER dimension overlaps at most half the files (the
    * single-key baseline leaves the second key unprunable: every file
    * overlaps). */
  def compactZOrdered(
      s: SparkSession,
      srcPath: String,
      dstPath: String,
      keyA: String,
      keyB: String,
      nFiles: Int): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val df = s.read.parquet(srcPath)
    val Row(minA: Long, maxA: Long, minB: Long, maxB: Long) = df
      .agg(
        min(col(keyA).cast("long")),
        max(col(keyA).cast("long")),
        min(col(keyB).cast("long")),
        max(col(keyB).cast("long")))
      .na.fill(0L)
      .head()
    // overflow discipline: a full-range key (e.g. an xxhash64-derived
    // column) has hi − lo past Long.MaxValue, and under ANSI a plain
    // subtraction THROWS. The lattice therefore works in UNSIGNED key
    // order: x XOR Long.MinValue maps signed order to unsigned order,
    // the span/shift come from BigInt (exact for any range), shift ≥ 1
    // keeps both shifted operands non-negative so their difference can
    // never overflow, and the ≤1 floor-misalignment overhang is clamped
    // to the top lattice cell (placement-only, never a correctness
    // surface — rows are just binned).
    def lattice(key: String, lo: Long, hi: Long) = {
      val span = (BigInt(hi) - BigInt(lo)).max(BigInt(1))
      val shift = math.max(span.bitLength - 16, 1)
      val uLoShifted = (lo ^ Long.MinValue) >>> shift
      least(
        shiftrightunsigned(
          coalesce(col(key).cast("long"), lit(lo)).bitwiseXOR(lit(Long.MinValue)),
          shift) - lit(uLoShifted),
        lit(65535L))
    }
    // Morton bit-spread: 16 significant bits widened so a bit at
    // position i lands at 2i — five shift-mask rounds, pure codegen'd
    // column arithmetic
    def spread(c: Column): Column = {
      val m = Seq(
        (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
      m.foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (x, (sh, mask)) =>
        (x.bitwiseOR(shiftleft(x, sh))).bitwiseAND(lit(mask))
      }
    }
    val z = spread(lattice(keyA, minA, maxA))
      .bitwiseOR(shiftleft(spread(lattice(keyB, minB, maxB)), 1))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode(SaveMode.Overwrite)
      .parquet(dstPath)
  }

  /** Per-file (min, max) of `key` under `path` — the clustering audit:
    * disjoint intervals across files = key predicates prune to one
    * file. One distributed scan (never a driver loop over files). */
  def fileKeyRanges(s: SparkSession, path: String, key: String): DataFrame =
    s.read
      .parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(key)).as("key_min"), max(col(key)).as("key_max"))

  private def parquetFiles(path: String): Seq[java.io.File] = {
    // Spark's file-visibility rule on EVERY path component (the
    // CorpusOps.committed() logic): a '_'/'.'-prefixed DIRECTORY is as
    // invisible as a file — recursing into _temporary would count a
    // crashed write's uncommitted task-attempt files
    def hidden(f: java.io.File): Boolean =
      f.getName.startsWith("_") || f.getName.startsWith(".")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (hidden(f)) Nil
      else if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Nil
    walk(new java.io.File(path))
  }
}
