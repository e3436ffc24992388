package graft

import org.apache.spark.sql.functions._

/** Round-10 additions: YoY lag-window shape and the composed
  * entity-resolution pipeline's structural invariants. */
class R14PlanSpec extends SparkSpecBase {

  private def q(name: String) = QueryRegistry.all.toMap.apply(name).run(spark, sf("sf0.001"))

  test("q_yoy: nation broadcasts; the lag window sorts the rollup, not the fact table") {
    val df = q("q_yoy")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"nation dim must broadcast:\n$plan")
    // the Window must consume an Aggregate, never the raw orders scan
    val opt = df.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val wins = opt.collect { case w: LWindow => w }
    assert(wins.nonEmpty && wins.forall(_.child.collectFirst { case a: Aggregate => a }.isDefined),
      s"lag window must sit above the nation×year aggregate:\n$opt")
    assert(df.count() > 0)
  }

  test("propagateEpoch: known motion gives the expected offset; -dt round-trips") {
    import spark.implicits._
    import graft.operators.Spatial
    // 1000 mas/yr for 36 years = 36 arcsec = 0.01 deg, at the equator
    val src = Seq((1L, 100.0, 0.0, 1000.0, -1000.0)).toDF("id", "ra", "dec", "pmra", "pmdec")
    val p = Spatial.propagateEpoch(src, "ra", "dec", "pmra", "pmdec", 36.0).collect()(0)
    assert(math.abs(p.getDouble(1) - 100.01) < 1e-9, s"ra: ${p.getDouble(1)}")
    assert(math.abs(p.getDouble(2) - (-0.01)) < 1e-9, s"dec: ${p.getDouble(2)}")
    // at dec=60 the same mu_alpha* moves ra by 0.01/cos(60) = 0.02 deg
    val hi = Seq((2L, 100.0, 60.0, 1000.0, 0.0)).toDF("id", "ra", "dec", "pmra", "pmdec")
    val q = Spatial.propagateEpoch(hi, "ra", "dec", "pmra", "pmdec", 36.0).collect()(0)
    assert(math.abs(q.getDouble(1) - (100.0 + 0.01 / math.cos(math.toRadians(60)))) < 1e-9)
    // inverse propagation restores the original position to flat-sky accuracy
    val back = Spatial.propagateEpoch(
      Spatial.propagateEpoch(src, "ra", "dec", "pmra", "pmdec", 36.0),
      "ra", "dec", "pmra", "pmdec", -36.0).collect()(0)
    assert(math.abs(back.getDouble(1) - 100.0) < 1e-7 && math.abs(back.getDouble(2) - 0.0) < 1e-12)
    // map-only: no exchange of any kind in the propagation itself
    val plan = Spatial.propagateEpoch(src, "ra", "dec", "pmra", "pmdec", 36.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"epoch propagation must not shuffle:\n$plan")
  }

  test("q_lcfeatures: white noise gives eta near 2, a smooth ramp near 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions.timestamp_micros
    val DayUs = 86400000000L
    def series(key: Long, ys: Seq[Double]) = ys.zipWithIndex.map { case (y, i) =>
      (key, (i + 1).toLong, i * DayUs / 24, y)
    }
    // deterministic pseudo-noise vs a monotone ramp
    val noise = series(1L, (0 until 64).map(i => ((i * 2654435761L) % 1000).toDouble / 100.0))
    val ramp = series(2L, (0 until 64).map(i => i.toDouble / 10.0))
    val df = (noise ++ ramp).toDF("user_id", "event_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val e4 = df.withColumn("y", floor(col("value") * 10000).cast("long"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("us", "event_id")
    val out = e4.withColumn("dy", col("y") - lag("y", 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("y").as("sy"), sum(col("y") * col("y")).as("syy"),
        sum(col("dy") * col("dy")).as("n1"))
      .select(col("user_id"), (col("n1").cast("double") * col("n") /
        (col("n") * col("syy") - col("sy") * col("sy"))).as("eta"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > 1.2 && out(1L) < 3.0, s"noise eta ~ 2: ${out(1L)}")
    assert(out(2L) < 0.1, s"ramp eta ~ 0: ${out(2L)}")
  }

  test("pipeline_er: entity partition is consistent (sizes sum to corpus, one canonical each)") {
    val out = q("pipeline_er").cache()
    try {
      val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet").count()
      assert(out.count() == docs, "every document gets exactly one entity row")
      // csize really is the entity's row count
      val bad = out.groupBy("entity_id").agg(count(lit(1)).as("n"), first("csize").as("c"),
          sum(when(col("is_canonical"), 1).otherwise(0)).as("canon"))
        .filter(col("n") =!= col("c") || col("canon") =!= 1).count()
      assert(bad == 0, "each entity: csize == member count and exactly one canonical")
      // canonical representative is the smallest member id
      val badCanon = out.groupBy("entity_id").agg(min("doc_id").as("lo"))
        .filter(col("entity_id") =!= col("lo")).count()
      assert(badCanon == 0, "entity_id must be the component minimum")
    } finally out.unpersist()
  }
}
