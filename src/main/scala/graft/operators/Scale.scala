package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques that only show up in *how* a query runs, not what it
  * returns: bucketed co-located joins and skew salting. Exercised by
  * `ScaleSpec` with physical-plan assertions (no Exchange on the bucketed
  * join; identical results for salted vs plain join).
  */
object Scale {

  /** Persist orders + lineitem bucketed by order key, then join the saved
    * tables. With matching bucket counts Spark plans a SortMergeJoin with
    * NO shuffle exchange — at 100 TB this turns the nightly fact-fact join
    * from the dominant shuffle into a local merge per bucket. The shuffle
    * is paid once at write time and amortized over every later join. */
  def bucketedOrdersJoin(
      s: SparkSession,
      dir: String,
      buckets: Int = 8): DataFrame = {
    // idempotent: drop catalog entries AND their managed locations (a
    // crashed prior run can leave the directory without the table)
    val warehouse = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    for (t <- Seq("graft_orders_b", "graft_lineitem_b")) {
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(warehouse, t)
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    graft.sources.Tables
      .orders(s, dir)
      .write
      .mode("overwrite")
      .bucketBy(buckets, "o_orderkey")
      .sortBy("o_orderkey")
      .saveAsTable("graft_orders_b")
    graft.sources.Tables
      .lineitem(s, dir)
      .write
      .mode("overwrite")
      .bucketBy(buckets, "l_orderkey")
      .sortBy("l_orderkey")
      .saveAsTable("graft_lineitem_b")
    val o = s.table("graft_orders_b")
    val l = s.table("graft_lineitem_b")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"))
      .orderBy("o_orderpriority")
  }

  /** Salted join for skewed keys: replicate the build side `salt` times and
    * scatter the probe side across replicas with a deterministic hash.
    * Results are identical to the plain join; the skewed key's rows land on
    * `salt` tasks instead of one. (AQE's skew-join split handles the same
    * problem reactively; salting is the proactive version for known-skewed
    * keys like null-heavy foreign keys.) */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: Column,
      buildKey: Column,
      salt: Int): DataFrame = {
    val salted = build
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    val probeSalted = probe
      .withColumn("__salt", pmod(xxhash64(probeKey), lit(salt)).cast("int"))
    probeSalted
      .join(salted, probeKey === buildKey && probeSalted("__salt") === salted("__salt"))
      .drop("__salt")
  }
}
