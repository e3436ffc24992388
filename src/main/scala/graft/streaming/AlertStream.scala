package graft.streaming

import graft.functions.sphere
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming alert cross-match — the time-domain broker shape
 * (ZTF/LSST alert streams: every arriving detection is matched
 * against a static reference catalog within an angular threshold,
 * continuously). The batch engine's kNN cross-match ranks per-left
 * row (a window), which append-mode streaming cannot express; the
 * broker semantics — ALL reference objects within `dthreshDeg`,
 * downstream picks what it needs — is a pure stream-static pixel
 * equi-join + exact distance filter, so it runs stateless per
 * micro-batch with no watermark.
 *
 * Scale shape: the reference is prepared ONCE ([[prepareReference]]:
 * margin-cover explode to the same order the stream side hashes to —
 * reference catalog x bounded cover fan-out); each micro-batch then
 * pays one map-only pixel assignment + the equi-join against the
 * static side (Spark reuses the static relation across batches).
 * Exactly-once by construction on the reference side: the stream row
 * owns ONE pixel, the reference row is the side exploded to every
 * pixel within the threshold of it — the same own-pixel vs disc-cover
 * contract as the batch pair-join (Spatial.pairJoin).
 */
object AlertStream {

  /** One-time static prep: reference rows exploded to every order-k
   *  pixel within `dthreshDeg` of them. Order defaults to the batch
   *  cross-match's auto rule for the threshold. */
  def prepareReference(ref: DataFrame, raCol: String, decCol: String,
                       dthreshDeg: Double, order: Int = -1): DataFrame = {
    val o = if (order >= 0) order else graft.operators.Spatial.autoOrder(dthreshDeg)
    val prefixed = ref.columns.foldLeft(ref)((d, c) => d.withColumnRenamed(c, "ref_" + c))
    prefixed.withColumn("__pix",
        explode(sphere.hpixCover(col("ref_" + raCol), col("ref_" + decCol), o, lit(dthreshDeg))))
      .withColumn("__order", lit(o))
  }

  /** Stream-static threshold cross-match: `alerts` may be a streaming
   *  frame; `preparedRef` must come from [[prepareReference]] with
   *  the same threshold. Output: alert columns + `ref_*` columns +
   *  `_DIST` (degrees, exact great-circle). Alerts matching nothing
   *  produce no row (inner join — the broker's "known object" path;
   *  feed the complement to discovery). */
  def xmatchStream(alerts: DataFrame, raCol: String, decCol: String,
                   preparedRef: DataFrame, dthreshDeg: Double): DataFrame = {
    val o = preparedRef.select(max("__order")).first().getInt(0)
    val refRa = "ref_" + raCol
    val refDec = "ref_" + decCol
    alerts.withColumn("__pix", sphere.hpix(col(raCol), col(decCol), o))
      .join(preparedRef, "__pix")
      .withColumn("_DIST",
        sphere.gcDist(col(raCol), col(decCol), col(refRa), col(refDec)))
      .filter(col("_DIST") < dthreshDeg)
      .drop("__pix", "__order")
  }
}
