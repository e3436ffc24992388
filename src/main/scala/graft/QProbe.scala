package graft
object QProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions.install)
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args(0).split(",")
    val qs = QueryRegistry.all.toMap
    def q(n: String) = qs.getOrElse(n, sys.error(s"unknown query '$n' — names: ${qs.keys.toSeq.sorted.mkString(", ")}"))
    names.foreach { n =>
      q(n).run(spark, args(1))
        .coalesce(1).write.mode("overwrite").parquet(s"/tmp/qprobe/$n")
      println(s"PROBE_OK $n")
    }
    val oj = names.map(n => "\"" + n + "\": " + q(n).oracle.map(s => "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"; case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\"").getOrElse("null")).mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/qprobe/oracle_sql.json"), oj)
    spark.stop()
  }
}
// Dev utility: dump + oracle-check a subset of registry queries
// without a full Verify sweep (pair with tools/check_oracle.py).
