package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/**
 * Streaming heavy-hitter candidates: sharded Misra-Gries summaries
 * maintained in mapGroupsWithState.
 *
 * Terms hash into `shards` independent MG summaries; each shard's
 * state is AT MOST k counters plus its stream length — O(shards * k)
 * total state for an unbounded stream. The MG guarantee composes
 * across shards exactly as it does across batch partitions
 * ([[graft.operators.Sketch.heavyHitters]]): a term's occurrences all
 * land in ONE shard (hash partitioning), so a term with global count
 * c > n_shard/(k+1) >= its own shard threshold survives in that
 * shard's summary. The union of shard summaries is therefore a
 * candidate SUPERSET of every term with global count > N/(k+1);
 * exact counts come from a second (batch) pass over the candidates,
 * as in the batch operator.
 *
 * Each micro-batch emits the updated shard's full summary tagged with
 * a per-shard batch sequence number — consumers keep the rows with
 * each shard's max batch_seq (the latest snapshot).
 */
object HeavyHittersStream {

  case class MgState(counters: Map[String, Long], n: Long, batches: Long)

  def candidates(terms: DataFrame, termCol: String, k: Int,
                 shards: Int = 16): DataFrame = {
    require(k >= 1, s"heavyHittersStream: k must be >= 1, got $k")
    require(shards >= 1 && shards <= 4096,
      s"heavyHittersStream: shards must be in [1,4096], got $shards")
    val spark = terms.sparkSession
    import spark.implicits._
    val ds: Dataset[String] = terms
      .select(col(termCol).cast("string").as("term"))
      .filter(col("term").isNotNull).as[String]
    ds.groupByKey(t => math.floorMod(t.##, shards))
      .flatMapGroupsWithState[MgState, (Int, String, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) { (shard, it, state) =>
        val st = state.getOption.getOrElse(MgState(Map.empty, 0L, 0L))
        val m = collection.mutable.Map(st.counters.toSeq: _*)
        var n = st.n
        it.foreach { t =>
          n += 1
          if (m.contains(t)) m(t) += 1
          else if (m.size < k) m(t) = 1L
          else {
            // decrement-all round: every counter pays one, zeros drop
            m.mapValuesInPlace((_, v) => v - 1)
            m.filterInPlace((_, v) => v > 0)
          }
        }
        val next = MgState(m.toMap, n, st.batches + 1)
        state.update(next)
        m.iterator.map { case (t, w) => (shard, t, w, n, next.batches) }
      }
      .toDF("shard", "term", "wt", "n_shard", "batch_seq")
  }
}
