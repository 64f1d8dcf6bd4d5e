package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory for the graft engine.
  *
  * Everything here is sized for the dev harness (local[32], 128 GiB) but the
  * knobs are the same ones a 1000-executor deployment would set:
  *   - AQE on: runtime coalescing + skew-join splitting replace hand-tuned
  *     partition counts when data volume moves 100×.
  *   - shuffle.partitions small locally; at cluster scale this is overridden
  *     by `spark.sql.adaptive.coalescePartitions.initialPartitionNum`.
  *   - UTC session timezone so timestamp semantics match the DuckDB oracle.
  *   - `parquet.nanosAsLong`: the events table carries INT64 TIMESTAMP(NANOS)
  *     which Spark's reader rejects; we read raw nanos and downcast (see
  *     [[graft.sources.Tables.events]]).
  */
object GraftSession {
  def builder(
      appName: String = "graft",
      master: String = "local[*]",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = builder().getOrCreate()

  /** Apply graft session-level settings to an externally built session
    * (Verify/Bench create their own); safe to call repeatedly. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }
}
