package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // n >= 3 so the reported number is a median, not a draw from
    // JIT/environment noise (r2 showed ~15% run-to-run drift on
    // queries whose code had not changed)
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    require(nRuns >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1 (got $nRuns)")
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions.install)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up session: parquet footers, codegen, shuffle machinery
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().count()
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // run 0 is a discarded warm-up (per-query codegen compilation —
    // constant cost, irrelevant at scale); report the median of the
    // remaining nRuns steady-state runs
    // optional comma-separated query-name filter for targeted iteration
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (0 to nRuns).map { _ =>
        val t0 = System.nanoTime()
        // a failed query must not masquerade as a fast success
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      }
      // registry queries that persist intermediates (minhash/neardup
      // signature caches) have no post-materialization unpersist hook,
      // so cached blocks accumulate across the 50+ query sweep; clear
      // between queries so storage-memory pressure from earlier
      // queries can't evict/spill and distort later measurements
      spark.sharedState.cacheManager.clearCache()
      name -> (if (times.contains(-1.0)) -1.0 else median(times.tail))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
