package graft

import graft.catalog.{Catalog, HipsCatalog, HipsPartitioner}
import graft.functions.sphere
import org.apache.spark.sql.functions._

class CatalogSpec extends SparkSpecBase {

  private def li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    .withColumn("k", col("l_orderkey") * 8 + col("l_linenumber"))
    .withColumn("cra", sphere.raOf(col("k")))
    .withColumn("cdec", sphere.decOf(col("k")))

  test("adaptive partition map: every pixel assigned, dense regions subdivide") {
    val pm = HipsPartitioner.computePartitionMap(li, "cra", "cdec", orderK = 4, threshold = 500)
    assert(pm.orders.forall(o => o >= 0 && o <= 4))
    // partition counts respect the threshold (except possibly at order k)
    val counts = HipsPartitioner.withPartitionColumns(li, "cra", "cdec", pm)
      .groupBy("Norder", "Npix").count().collect()
    counts.filter(_.getInt(0) < 4).foreach(r => assert(r.getLong(2) < 500, s"partition over threshold: $r"))
    assert(counts.map(_.getLong(2)).sum == li.count())
  }

  test("write + load round-trips all rows; hive cone search equals brute force") {
    val out = java.nio.file.Files.createTempDirectory("graft_cat").toString
    HipsPartitioner.write(li, "cra", "cdec", "k", out, "litest", orderK = 4, threshold = 500, marginDeg = 1.0)

    val loaded = HipsCatalog.load(spark, out, "litest")
    assert(loaded.count() == li.count())

    for (radius <- Seq(10.0, 30.0)) {
      val cone = HipsCatalog.coneSearch(spark, out, "litest", "cra", "cdec", 180.0, 0.0, radius, orderK = 4)
        .select("k").collect().map(_.getLong(0)).sorted
      val brute = li.withColumn("d", sphere.gcDist(col("cra"), col("cdec"), lit(180.0), lit(0.0)))
        .filter(col("d") < radius).select("k").collect().map(_.getLong(0)).sorted
      assert(cone.toSeq == brute.toSeq, s"radius=$radius")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }

  test("stored cross-match (catalog + neighbor files) equals in-flight crossMatchKnn") {
    val out = java.nio.file.Files.createTempDirectory("graft_xm").toString
    val cust = spark.read.parquet(sf("sf0.001") + "/customer.parquet")
      .withColumn("cra", sphere.raOf(col("c_custkey")))
      .withColumn("cdec", sphere.decOf(col("c_custkey")))
    val supp = spark.read.parquet(sf("sf0.001") + "/supplier.parquet")
      .withColumn("sra", sphere.raOf(col("s_suppkey")))
      .withColumn("sdec", sphere.decOf(col("s_suppkey")))
    HipsPartitioner.write(cust, "cra", "cdec", "c_custkey", out, "c1", orderK = 2, threshold = 100, marginDeg = 12.0)
    HipsPartitioner.write(supp, "sra", "sdec", "s_suppkey", out, "c2", orderK = 2, threshold = 100, marginDeg = 12.0)

    val stored = HipsCatalog.crossMatchStored(spark, out, "c1", "c2",
      "cra", "cdec", "c_custkey", "sra", "sdec", "s_suppkey", k = 2, dthreshDeg = 10.0, orderK = 2)
      .select("c_custkey", "r_s_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted

    val inflight = graft.operators.Spatial.crossMatchKnn(cust, supp,
      "cra", "cdec", "c_custkey", "sra", "sdec", "s_suppkey",
      k = 2, dthreshDeg = 10.0, leftPrefix = "", rightPrefix = "x_")
      .select("c_custkey", "x_s_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted

    assert(stored.toSeq == inflight.toSeq)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }

  test("Catalog object API: import, load with pruning, cone search, cross-match") {
    val out = java.nio.file.Files.createTempDirectory("graft_oo").toString
    val cust = spark.read.parquet(sf("sf0.001") + "/customer.parquet")
      .withColumn("cra", sphere.raOf(col("c_custkey")))
      .withColumn("cdec", sphere.decOf(col("c_custkey")))
    val supp = spark.read.parquet(sf("sf0.001") + "/supplier.parquet")
      .withColumn("sra", sphere.raOf(col("s_suppkey")))
      .withColumn("sdec", sphere.decOf(col("s_suppkey")))

    val c1 = Catalog.importFrom(cust, out, "cust", "cra", "cdec", "c_custkey",
      orderK = 2, threshold = 100, marginDeg = 12.0)
    val c2 = Catalog.importFrom(supp, out, "supp", "sra", "sdec", "s_suppkey",
      orderK = 2, threshold = 100, marginDeg = 12.0)

    assert(c1.raKw == "cra" && c1.orderK == 2)
    assert(c1.load(Seq("c_name")).columns.toSet == Set("c_name", "cra", "cdec", "c_custkey"))
    assert(c1.coneSearch(180.0, 0.0, 30.0).count() == 17)

    val xm = c1.crossMatch(c2, nNeighbors = 2, dthreshDeg = 10.0)
    assert(xm.columns.contains("supp_s_suppkey") && xm.columns.contains("_DIST"))
    assert(xm.count() > 0)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }

  test("ingest path is UDF-free and stays inside WholeStageCodegen") {
    val pm = HipsPartitioner.computePartitionMap(li, "cra", "cdec", orderK = 4, threshold = 500)
    val assignPlan = HipsPartitioner.withPartitionColumns(li, "cra", "cdec", pm)
      .queryExecution.executedPlan.toString
    assert(!assignPlan.contains("UDF"), s"partition assignment must not use a Scala UDF:\n$assignPlan")
    assert(assignPlan.contains("*("), s"assignment must be inside a WholeStageCodegen stage:\n$assignPlan")
    val marginPlan = HipsPartitioner.marginRows(li, "cra", "cdec", pm, marginDeg = 1.0)
      .queryExecution.executedPlan.toString
    assert(!marginPlan.contains("UDF"), s"margin explode must not use a Scala UDF:\n$marginPlan")
  }

  test("margin cache: rows land under foreign pixels within the margin") {
    val pm = HipsPartitioner.computePartitionMap(li, "cra", "cdec", orderK = 4, threshold = 500)
    val margins = HipsPartitioner.marginRows(li, "cra", "cdec", pm, marginDeg = 1.0)
    val own = HipsPartitioner.withPartitionColumns(li, "cra", "cdec", pm)
      .select(col("k"), col("Norder"), col("Npix"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val rows = margins.select("k", "Norder", "Npix").collect()
    assert(rows.nonEmpty, "some rows must fall within 1 deg of a foreign pixel")
    rows.foreach { r =>
      assert(own(r.getLong(0)) != (r.getInt(1), r.getLong(2)), "margin pixel must differ from home pixel")
    }
  }
}
