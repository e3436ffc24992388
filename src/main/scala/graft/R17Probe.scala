package graft

import org.apache.spark.sql.functions._

/** Dev-only stage decomposition probe for round-17 optimization work
  * (graph_pagerank cost breakdown). Not part of the graded surface. */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions.install)
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (2L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm up
    spark.read.parquet(s"$dir/lineitem.parquet").groupBy("l_returnflag").count().count()
    for (round <- 1 to 3) {
      println(s"--- round $round")
      val fwd = spark.read.parquet(s"$dir/lineitem.parquet")
        .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      val edges0 = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      val edges = edges0.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).distinct()
      time("edges.distinct.count")(edges.count())
      val rows = time("limit(1M+1).collect")(edges.limit(1000001).collect())
      println(s"PROBE n_edges=${rows.length}")
      time("driver replay 5 iters") {
        val od = new java.util.HashMap[Long, Long]()
        rows.foreach(r => od.merge(r.getLong(0), 1L, _ + _))
        val nodeSet = new java.util.HashSet[Long]()
        rows.foreach { r => nodeSet.add(r.getLong(0)); nodeSet.add(r.getLong(1)) }
        var ranks = new java.util.HashMap[Long, Long]()
        nodeSet.forEach(n => ranks.put(n, 1000000000L))
        for (_ <- 1 to 5) {
          val contrib = new java.util.HashMap[Long, Long]()
          rows.foreach { r =>
            val s = r.getLong(0)
            contrib.merge(r.getLong(1), ranks.get(s) / od.get(s), _ + _)
          }
          val next = new java.util.HashMap[Long, Long]()
          nodeSet.forEach(n => next.put(n, 150000000L + 85L * contrib.getOrDefault(n, 0L) / 100L))
          ranks = next
        }
        println(s"PROBE n_nodes=${ranks.size}")
      }
      time("full graph_pagerank query") {
        QueryRegistry.all.toMap.apply("graph_pagerank").run(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
