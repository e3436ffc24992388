package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Per-partition bounded-heap top-k combiner — the map-side half of a
 * distributed "rank within group, keep k" that keeps the final
 * `Window.partitionBy(group)` exchange BOUNDED.
 *
 * The problem it solves at scale: ranking |corpus| candidate rows per
 * query with a bare window sorts every candidate on ONE task per
 * query (the window partition). At 10^9 corpus rows that is a
 * single-task, corpus-sized sort per query — candidate *generation*
 * scales, candidate *selection* doesn't. Pre-filtering each input
 * partition to its local top-k per group is lossless (a globally
 * top-k row is necessarily top-k within its own partition, whatever
 * the partitioning — broadcast builds and AQE skew splits included),
 * so the exact window afterwards ranks at most k rows per group per
 * partition instead of every candidate.
 *
 * Correctness hinges on the combiner's ordering equaling the final
 * window's ordering BIT FOR BIT, so the score is rounded exactly like
 * Spark's `round(col, 9)` (BigDecimal HALF_UP on the double) before
 * comparison, and ties break on the id ascending — the same
 * (round(score, 9), id) ordering every ranking window in this repo
 * uses. `ascending = false` ranks best-score-highest (cosine);
 * `ascending = true` ranks best-score-lowest (distances).
 */
object TopK {

  /** [[partitionTopK]] when the (id, score) types support the heap's
   *  bit-exact ordering, identity otherwise — callers with arbitrary
   *  user id types degrade to the plain (exact, unbounded) window
   *  instead of failing. */
  private[graft] def maybePartitionTopK(df: DataFrame, groupCol: String, idCol: String,
                                        scoreCol: String, k: Int, ascending: Boolean): DataFrame =
    if (df.schema(idCol).dataType == LongType && df.schema(scoreCol).dataType == DoubleType)
      partitionTopK(df, groupCol, idCol, scoreCol, k, ascending)
    else df

  private[graft] def partitionTopK(df: DataFrame, groupCol: String, idCol: String,
                                   scoreCol: String, k: Int, ascending: Boolean): DataFrame = {
    require(k >= 1, s"partitionTopK: k must be >= 1 (got $k)")
    val inSchema = df.schema
    require(inSchema(idCol).dataType == LongType,
      s"partitionTopK requires a LongType tie-break id; got ${inSchema(idCol).dataType} for $idCol")
    require(inSchema(scoreCol).dataType == DoubleType,
      s"partitionTopK requires a DoubleType score; got ${inSchema(scoreCol).dataType} for $scoreCol")
    val gIdx = inSchema.fieldIndex(groupCol)
    val iIdx = inSchema.fieldIndex(idCol)
    val sIdx = inSchema.fieldIndex(scoreCol)
    val sign = if (ascending) 1.0 else -1.0
    // heap orders worst-first so the (k+1)th candidate evicts in O(log k)
    implicit val ord: Ordering[(Double, Long, Row)] =
      Ordering.by[(Double, Long, Row), (Double, Long)](t => (t._1, t._2))
    df.mapPartitions { rows =>
      val best = scala.collection.mutable.HashMap
        .empty[Any, scala.collection.mutable.PriorityQueue[(Double, Long, Row)]]
      rows.foreach { r =>
        if (!r.isNullAt(sIdx)) {
          // rounded EXACTLY like Spark's round(_, 9) (HALF_UP on the
          // decimal rendering) — lossless only if this ordering equals
          // the final window's ordering bit for bit. The sign flip for
          // descending ranks maps both rounded 0.0s through the same
          // negation, so a zero-score tie still falls to the id.
          val d = sign * BigDecimal.decimal(r.getDouble(sIdx))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
          val key = (d, r.getLong(iIdx), r)
          val q = best.getOrElseUpdate(r.get(gIdx),
            scala.collection.mutable.PriorityQueue.empty[(Double, Long, Row)])
          if (q.size < k) q.enqueue(key)
          else if (ord.lt(key, q.head)) { q.dequeue(); q.enqueue(key) }
        }
      }
      best.valuesIterator.flatMap(_.iterator.map(_._3))
    }(org.apache.spark.sql.Encoders.row(inSchema))
  }
}
