package graft

import graft.functions.sphere
import org.apache.spark.sql.functions._

class PlansSpec extends SparkSpecBase {

  test("SpatialFilterPushdown derives scan-pushable bounds from gc_dist filters") {
    // stored ra/dec columns (write a small parquet with real coords)
    val dir = java.nio.file.Files.createTempDirectory("graft_rule").toString
    spark.read.parquet(sf("sf0.001") + "/customer.parquet")
      .withColumn("ra", sphere.raOf(col("c_custkey")))
      .withColumn("dec", sphere.decOf(col("c_custkey")))
      .write.mode("overwrite").parquet(s"$dir/cat")

    val df = spark.read.parquet(s"$dir/cat")
      .filter(sphere.gcDist(col("ra"), col("dec"), lit(180.0), lit(0.0)) < 5.0)

    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains(">= -5.0") && opt.contains("<= 5.0"), s"dec bounds must be added:\n$opt")
    assert(opt.contains("174.98"), s"ra bounds must be added:\n$opt")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(dec,-5.0"), s"dec bound must reach the parquet scan:\n$scan")

    // semantics unchanged: rule-added bounds are conservative
    val brute = spark.read.parquet(s"$dir/cat")
      .withColumn("d", sphere.gcDist(col("ra"), col("dec"), lit(180.0), lit(0.0)))
      .filter(col("d") < 5.0).count()
    assert(df.count() == brute)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("pushdown bounds keep rows stored in the [-180,180) RA convention") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rule_wrap").toString
    // shift stored RA into [-180, 180): gc_dist is periodic so query
    // results must be identical; the injected bounds must not drop
    // the aliased rows (ra = -10 for a cone at ra0 = 350)
    spark.read.parquet(sf("sf0.001") + "/customer.parquet")
      .withColumn("ra", sphere.raOf(col("c_custkey")))
      .withColumn("dec", sphere.decOf(col("c_custkey")))
      .withColumn("ra", when(col("ra") >= 180.0, col("ra") - 360.0).otherwise(col("ra")))
      .write.mode("overwrite").parquet(s"$dir/cat")

    val cat = spark.read.parquet(s"$dir/cat")
    // driver-side truth (no optimizer involved)
    val rows = cat.select("ra", "dec").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    for ((ra0, dec0, r) <- Seq((350.0, 0.0, 5.0), (5.0, 10.0, 12.0), (180.0, -20.0, 10.0))) {
      val expected = rows.count { case (ra, dec) => graft.healpix.Healpix.gcDistDeg(ra, dec, ra0, dec0) < r }
      val viaRule = cat.filter(sphere.gcDist(col("ra"), col("dec"), lit(ra0), lit(dec0)) < r).count()
      assert(viaRule == expected, s"rule dropped wrapped rows for cone ($ra0,$dec0,$r)")
      val viaCone = operators.Spatial.coneSearch(cat, "ra", "dec", ra0, dec0, r).count()
      assert(viaCone == expected, s"coneSearch dropped wrapped rows for cone ($ra0,$dec0,$r)")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("SQL-registered graft functions work end to end") {
    val r = spark.sql(
      "SELECT hpix(45.0, 41.8103, 0) AS p, round(gc_dist(0.0, 0.0, 90.0, 0.0), 6) AS d, " +
        "cosine_sim(array(cast(1.0 as float), cast(0.0 as float)), array(cast(1.0 as float), cast(0.0 as float))) AS c")
      .collect()(0)
    assert(r.getLong(0) == 0L)
    assert(math.abs(r.getDouble(1) - 90.0) < 1e-9)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("gc_dist filter through SQL also gets the rule") {
    spark.read.parquet(sf("sf0.001") + "/customer.parquet")
      .withColumn("ra", sphere.raOf(col("c_custkey")))
      .withColumn("dec", sphere.decOf(col("c_custkey")))
      .createOrReplaceTempView("cat_v")
    val df = spark.sql("SELECT * FROM cat_v WHERE gc_dist(ra, dec, 180.0, 0.0) < 5.0")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains(">= -5.0") || optimized.contains(">= -5.0D") ||
      optimized.toLowerCase.contains("greaterthanorequal"),
      s"rule must add bounds:\n$optimized")
  }
}
