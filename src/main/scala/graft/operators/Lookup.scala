package graft.operators

import graft.functions.{IntervalLookupExpr, IntervalTable}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Broadcast interval-lookup join: annotate a fact table with the id
 * of the small-dimension interval covering each value (IP ranges,
 * price bands, SLA tiers). The dimension is collected ONCE (bounded,
 * validated non-overlapping), broadcast as sorted parallel arrays,
 * and probed by a codegen'd binary search — a map-only plan with NO
 * shuffle and no join node at all, where a generic range join would
 * shuffle the 100 TB fact side. Use [[Temporal.rangeJoin]] instead
 * when the interval side is itself large.
 */
object Lookup {

  /** Max dimension rows collected to the driver (64 MB of bounds). */
  val MaxIntervals: Int = 1 << 21

  def intervalLookupJoin(spark: SparkSession, facts: DataFrame, valueCol: String,
      intervals: DataFrame, loCol: String, hiCol: String, idCol: String,
      outCol: String = "interval_id"): DataFrame = {
    // limit BEFORE collect so an unexpectedly large dimension fails
    // the size check instead of OOMing the driver first
    val rows = intervals
      .select(col(loCol).cast("long"), col(hiCol).cast("long"), col(idCol).cast("long"))
      .limit(MaxIntervals + 1)
      .collect()
    require(rows.length <= MaxIntervals,
      s"intervalLookupJoin: dimension exceeds $MaxIntervals intervals; " +
        "use a range join for large interval sides")
    val sorted = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    sorted.foreach { case (lo, hi, id) =>
      require(lo < hi, s"intervalLookupJoin: empty interval [$lo, $hi) for id $id")
    }
    sorted.iterator.zip(sorted.iterator.drop(1)).foreach { case ((lo1, hi1, id1), (lo2, _, id2)) =>
      require(hi1 <= lo2,
        s"intervalLookupJoin: intervals overlap ([$lo1, $hi1) id $id1 vs lo $lo2 id $id2)")
    }
    val bc = spark.sparkContext.broadcast(
      IntervalTable(sorted.map(_._1), sorted.map(_._2), sorted.map(_._3)))
    facts.withColumn(outCol, GraftBridge.column(
      IntervalLookupExpr(GraftBridge.expression(col(valueCol).cast("long")), bc)))
  }
}
