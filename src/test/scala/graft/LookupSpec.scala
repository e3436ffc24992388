package graft

import graft.operators.Lookup
import org.apache.spark.sql.functions._

class LookupSpec extends SparkSpecBase {
  import spark.implicits._

  private val bands = Seq((0L, 10L, 100L), (10L, 20L, 200L), (50L, 60L, 300L))

  test("intervalLookupJoin: half-open bounds, gaps -> -1, nulls stay null") {
    val facts = Seq(Some(0L), Some(9L), Some(10L), Some(19L), Some(20L),
      Some(49L), Some(50L), Some(59L), Some(60L), Some(-1L), None).toDF("v")
    val out = Lookup.intervalLookupJoin(spark, facts, "v",
        bands.toDF("lo", "hi", "id"), "lo", "hi", "id")
      .collect().map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(out(0L) == 100L && out(9L) == 100L, "lo inclusive, inside")
    assert(out(10L) == 200L && out(19L) == 200L, "hi exclusive rolls to next band")
    assert(out(20L) == -1L && out(49L) == -1L, "gap between bands")
    assert(out(50L) == 300L && out(59L) == 300L)
    assert(out(60L) == -1L && out(-1L) == -1L, "outside both ends")
    assert(out(null.asInstanceOf[Any]) == null, "null input -> null output")
  }

  test("intervalLookupJoin matches a theta join on random data") {
    val rnd = new scala.util.Random(17)
    val facts = (1 to 3000).map(_ => rnd.nextInt(80).toLong).toDF("v").repartition(5)
    val dim = bands.toDF("lo", "hi", "id")
    val fast = Lookup.intervalLookupJoin(spark, facts, "v", dim, "lo", "hi", "id")
      .filter(col("interval_id") >= 0).groupBy(col("interval_id").as("id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slow = facts.join(dim, col("v") >= col("lo") && col("v") < col("hi"))
      .groupBy("id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == slow)
  }

  test("intervalLookupJoin plan is map-only: no join or exchange below the lookup") {
    val facts = Seq(1L, 2L).toDF("v")
    val plan = Lookup.intervalLookupJoin(spark, facts, "v",
        bands.toDF("lo", "hi", "id"), "lo", "hi", "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"no join node expected:\n$plan")
    assert(!plan.contains("Exchange"), s"no shuffle expected:\n$plan")
  }

  test("intervalLookupJoin rejects overlapping and empty intervals") {
    val facts = Seq(1L).toDF("v")
    assert(intercept[IllegalArgumentException] {
      Lookup.intervalLookupJoin(spark, facts, "v",
        Seq((0L, 10L, 1L), (5L, 15L, 2L)).toDF("lo", "hi", "id"), "lo", "hi", "id")
    }.getMessage.contains("overlap"))
    assert(intercept[IllegalArgumentException] {
      Lookup.intervalLookupJoin(spark, facts, "v",
        Seq((10L, 10L, 1L)).toDF("lo", "hi", "id"), "lo", "hi", "id")
    }.getMessage.contains("empty interval"))
  }
}
