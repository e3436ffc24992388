package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Pixel-pruned HEALPix cone search (30 deg — wide enough to catch
    * rows in the 150-row sf0.001 customer table). */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.sphere
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .withColumn("cra", sphere.raOf(col("c_custkey")))
      .withColumn("cdec", sphere.decOf(col("c_custkey")))
    graft.operators.Spatial.coneSearch(cust, "cra", "cdec", 180.0, 0.0, 30.0, order = 3)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.all.map { case (n, q) => n -> q.run }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueryRegistry.all.collect { case (n, q) if q.oracle.isDefined => n -> q.oracle.get }.toMap
}
