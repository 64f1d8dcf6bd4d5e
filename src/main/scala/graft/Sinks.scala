package graft

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Export sinks — the Spark rendering of the reference's result
  * persistence: full results into the analytical store and ~500-row
  * samples into a small-table store (reference main.py:264-289 DuckDB
  * tables, main.py:300-338 SQLite transfer).
  *
  * At scale the "small-table store" pattern stays the same: full results
  * are partitioned parquet (splittable, predicate-prunable); dashboards
  * read a coalesced sample extract, never the full table.
  */
object Sinks {

  /** Full-result sink: snappy parquet, optionally partitioned by columns
    * (partition pruning for downstream readers). */
  def fullParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Sample sink: one CSV file with header — the SQLite-export analog for
    * dashboard-scale extracts. Coalesce(1) is deliberate and safe ONLY for
    * pre-sampled data (the reference caps samples at ~500 rows). */
  def sampleCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1)
      .write
      .mode(SaveMode.Overwrite)
      .option("header", "true")
      .csv(path)

  /** Sorted, single-file parquet extract (small results only). */
  def sampleParquet(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)

  /** Key-based upsert into a parquet store: rows from `updates` replace
    * base rows with the same key; everything else is kept. The plan is one
    * left-anti join + union — the incremental-corpus-drop primitive for
    * stores without a transactional table format. NOT atomic: the rewrite
    * goes through a staging directory and a swap, so a reader never sees a
    * half-written store, but concurrent writers are the caller's problem
    * (use a transactional format when you have one). The swap uses local
    * java.io renames — on HDFS/S3 substitute the Hadoop FileSystem rename
    * (same two-step shape; S3 needs a manifest or a table format since
    * rename is copy-based there). */
  def upsertParquet(spark: org.apache.spark.sql.SparkSession, path: String, updates: DataFrame, key: String): Unit = {
    val merged =
      if (new java.io.File(path).exists()) {
        val base = spark.read.parquet(path)
        base
          .join(updates.select(key).withColumnRenamed(key, "__k"),
            base(key) === org.apache.spark.sql.functions.col("__k"), "left_anti")
          .unionByName(updates)
      } else updates
    val staging = path + ".staging"
    merged.write.mode(SaveMode.Overwrite).parquet(staging)
    val target = new java.io.File(path)
    if (target.exists()) {
      val old = new java.io.File(path + ".old")
      target.renameTo(old)
      new java.io.File(staging).renameTo(target)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(old)
    } else new java.io.File(staging).renameTo(target)
  }

  /** ORC sink — the other columnar interchange format (Hive-ecosystem
    * consumers); same partitioning semantics as [[fullParquet]]. */
  def fullOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** IVF vector store: vectors written partitioned by their coarse cell,
    * so an ANN probe of k cells prunes the other partitions AT THE READER
    * (PartitionFilters, no data touched) — the storage half of
    * [[graft.operators.Similarity.annIvf]]'s scale story. Expects a `cell`
    * column (the operator's assignment); everything else is passthrough. */
  def ivfPartitioned(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(path)

  /** Line-delimited JSON sink — the interchange format for feeding
    * downstream non-JVM consumers (labeling UIs, eval harnesses). One part
    * file per task, so reads parallelize ACROSS parts; note gzip is not a
    * splittable codec (each part is one read task) — pass compress=false
    * when single parts may grow large and need intra-file splitting. */
  def jsonLines(df: DataFrame, path: String, compress: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (compress) w.option("compression", "gzip") else w).json(path)
  }
}
