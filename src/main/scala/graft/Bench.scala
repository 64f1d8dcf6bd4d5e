package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: run every query once at the smallest SF so the timed pass
    // measures steady-state execution (janino-compiled codegen, JIT-warm
    // operators, loaded classes) — the regime a long-lived cluster runs in.
    // Profiling showed first runs are 3-8x slower purely from one-time
    // compile/scheduling costs; data at the target SF is still read cold.
    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory) "/root/testdata/sf0.001"
      else sfDir
    var warmFailures = 0
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count()
      catch { case _: Throwable => warmFailures += 1 }
    }
    if (warmFailures > 0)
      System.err.println(
        s"[bench] WARNING: $warmFailures/${SparkEntry.queries.size} warmup queries failed " +
          s"on $warmDir — timed numbers include first-run compile costs")
    // min of two timed runs per query: scheduler/GC noise on a shared box
    // is strictly additive, so the min is the better point estimate of the
    // query's true cost. A FAILING query must not masquerade as a fast one
    // (an exception path returns in ms) — failures are named loudly on
    // stderr and in the JSON.
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val timed = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (t1, ok1) = timeOnce(fn)
      val (t2, ok2) = timeOnce(fn)
      (name, math.min(t1, t2), ok1 && ok2)
    }
    val failed = timed.collect { case (name, _, false) => name }
    failed.foreach(n => System.err.println(s"[bench] ERROR: query $n FAILED during timing"))
    val qs = timed.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = timed.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
