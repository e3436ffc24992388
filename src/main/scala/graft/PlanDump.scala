package graft

/** Dev utility: print the executed physical plan of registry queries
  * (plan-audit loop — check pushdowns, broadcasts, codegen spans).
  * Usage: sbt "runMain graft.PlanDump q_cms,q_qsketch [sfDir]" */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) sys.error("usage: PlanDump <query[,query...]> [sfDir]")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions.install)
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val qs = QueryRegistry.all.toMap
    args(0).split(",").foreach { n =>
      val df = qs.getOrElse(n, sys.error(s"unknown query '$n'")).run(spark, dir)
      df.collect() // materialize so AQE finalizes the real plan
      println(s"===== $n =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
