package graft

import org.apache.spark.sql.functions._

/** Dev-only stage decomposition probe for round-17 optimization work.
  * Not part of the graded surface. */
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
    spark.read.parquet(s"$dir/lineitem.parquet").groupBy("l_returnflag").count().count()
    val qs = QueryRegistry.all.toMap
    for (round <- 1 to 3) {
      println(s"--- round $round")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val tgt = graft.operators.Lm.trainKneserNey(
        docs.filter(col("doc_id") < 300), "doc_id", "text")
      val src = graft.operators.Lm.trainKneserNey(
        docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
      time("tgt.bi build (count)")(tgt.bi.count())
      time("src.bi build (count)")(src.bi.count())
      time("importanceSampleKn after warm caches") {
        graft.operators.Lm.importanceSampleKn(docs, "doc_id", "text", tgt, src)
          .write.format("noop").mode("overwrite").save()
      }
      spark.sharedState.cacheManager.clearCache()
      time("full sample_dsir_kn query (cold)") {
        qs("sample_dsir_kn").run(spark, dir).write.format("noop").mode("overwrite").save()
      }
      spark.sharedState.cacheManager.clearCache()
      time("full text_ensemble query (cold)") {
        qs("text_ensemble").run(spark, dir).write.format("noop").mode("overwrite").save()
      }
      spark.sharedState.cacheManager.clearCache()
      time("full pipeline_er query (cold)") {
        qs("pipeline_er").run(spark, dir).write.format("noop").mode("overwrite").save()
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
