package graft

import org.apache.spark.sql.functions._
import graft.operators.Lightcurve

/** Lomb–Scargle periodogram + structure function: golden physics
  * (peak at the injected frequency, time-shift invariance), exact
  * hand-computed pair sums, and the map-only-expansion plan shape. */
class LightcurveSpec extends SparkSpecBase {

  private val DayUs = 86400000000L

  /** Unevenly sampled pure sinusoid at f0 cycles/day over ~20 days. */
  private def sinusoid(f0: Double, n: Int = 60, epochUs: Long = 0L) = {
    import spark.implicits._
    val phi = 0.6180339887498949 // golden-ratio low-discrepancy spacing
    (0 until n).map { i =>
      val tDays = (i * phi * 20.0) % 20.0
      val us = epochUs + (tDays * DayUs).toLong
      val t = (us - epochUs).toDouble / DayUs
      (1L, us, math.sin(2 * math.Pi * f0 * t))
    }.toDF("obj", "us", "y").select(col("obj"), timestamp_micros(col("us")).as("ts"), col("y"))
  }

  test("lombScargle peaks at the injected frequency") {
    val df = sinusoid(f0 = 0.7)
    val out = Lightcurve.lombScargle(df, "obj", "ts", "y", nFreq = 20, freqDenom = 10.0,
      epochUs = 0L, minPoints = 8).collect()
    assert(out.length == 20)
    val byFk = out.map(r => r.getLong(1) -> r.getDouble(3)).toMap
    val peak = byFk.maxBy(_._2)._1
    assert(peak == 7L, s"expected the f=0.7 c/d grid point to win, got fk=$peak: $byFk")
    // a noiseless sinusoid concentrates essentially all normalized
    // power at the true frequency: P ~ (n-1)/2 >> off-peak
    assert(byFk(7L) > 5 * byFk.filter(_._1 != 7L).values.max,
      s"peak must dominate: $byFk")
  }

  test("lombScargle is invariant to a global time shift (tau offset)") {
    val base = Lightcurve.lombScargle(sinusoid(0.7), "obj", "ts", "y",
      epochUs = 0L).collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // same series 37 days later, epoch anchor unchanged
    val shifted = Lightcurve.lombScargle(sinusoid(0.7, epochUs = 37L * DayUs)
        .withColumn("ts", timestamp_micros(unix_micros(col("ts")))), "obj", "ts", "y",
      epochUs = 0L).collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    base.foreach { case (fk, p) =>
      assert(math.abs(p - shifted(fk)) < 1e-6, s"fk=$fk: $p vs ${shifted(fk)}")
    }
  }

  test("lombScargle drops series below minPoints") {
    import spark.implicits._
    val tiny = (0 until 5).map(i => (9L, i * DayUs, i.toDouble)).toDF("obj", "us", "y")
      .select(col("obj"), timestamp_micros(col("us")).as("ts"), col("y"))
    assert(Lightcurve.lombScargle(tiny, "obj", "ts", "y", minPoints = 8).count() == 0)
  }

  test("structureFunction: exact hand-computed lag bins, strict pair order") {
    import spark.implicits._
    val rows = Seq( // (day-fraction, value) for one object
      (1L, 0.0, 1.0), (1L, 0.5, 3.0), (1L, 1.2, 6.0), (1L, 3.0, 10.0),
      // object 2: two observations at the SAME instant — no pair
      (2L, 2.0, 1.0), (2L, 2.0, 9.0))
    val df = rows.map { case (k, d, y) => (k, (d * DayUs).toLong, y) }
      .toDF("obj", "us", "y")
      .select(col("obj"), timestamp_micros(col("us")).as("ts"), col("y"))
    val out = Lightcurve.structureFunction(df, "obj", "ts", "y", maxLagDays = 5)
      .orderBy("obj", "lag_days").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // pairs: lag0 {4, 9}, lag1 {25, 16}, lag2 {49}, lag3 {81}; obj 2 empty
    assert(out.toSeq == Seq((1L, 0L, 2L, 13.0), (1L, 1L, 2L, 41.0),
      (1L, 2L, 1L, 49.0), (1L, 3L, 1L, 81.0)))
  }

  test("structureFunction partials merge across epochs (sum_d2/n_pairs additive)") {
    val a = sinusoid(0.5, n = 30)
    val whole = Lightcurve.structureFunction(a, "obj", "ts", "y", maxLagDays = 3)
      .selectExpr("sum(sum_d2)", "sum(n_pairs)").collect()(0)
    // recompute from the convenience mean: sf * n == sum
    val back = Lightcurve.structureFunction(a, "obj", "ts", "y", maxLagDays = 3)
      .selectExpr("sum(sf * n_pairs)", "sum(n_pairs)").collect()(0)
    assert(math.abs(whole.getDouble(0) - back.getDouble(0)) < 1e-9)
    assert(whole.getLong(1) == back.getLong(1))
  }

  test("lombScargle plan: stats join broadcasts, expansion is map-only (no SMJ)") {
    val df = QueryRegistry.all.toMap.apply("q_periodogram").run(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"per-key mean must join via broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no shuffle join anywhere in the periodogram:\n$plan")
    // exactly the two aggregation shuffles (per-key stats, (key,freq)
    // powers) — the ×20 expansion itself must not repartition
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges:\n$plan")
  }

  test("structureFunction plan: one co-located self-join on the key") {
    val df = QueryRegistry.all.toMap.apply("q_structfunc").run(spark, sf("sf0.001"))
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"the lag bound must ride an equi-join on the key, never a product:\n$plan")
  }
}
