package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.operators.Multimodal

/**
 * Streaming face of the perceptual image-dedup pipeline (the media
 * twin of [[DocIngest]]): media batches land in a directory, each
 * row decodes + dHashes map-only ON the stream (stateless typed
 * mapPartitions — the decode pass needs no state, no watermark), and
 * dedup runs against the STORED [[Multimodal.phashGroups]] state of
 * the history corpus — history pixels are never re-decoded.
 *
 * Two faces, matching the batch operator's two strengths:
 *  - [[exactDedupStream]]: pure stream-static anti-join on the hash —
 *    runs fully inside the streaming plan (append mode, no state).
 *  - [[classifyStream]]: the full exact/near/fresh classification
 *    ([[Multimodal.phashIncremental]]) applied per micro-batch via
 *    foreachBatch — the banded cross join + nearest-match aggregate
 *    need multi-pass batch semantics, so each micro-batch runs the
 *    EXACT batch operator (stream == batch by construction; parity
 *    asserted in StreamingSpec anyway).
 */
object MediaIngest {

  /** Media-table schema for the file-source stream (the
   *  [[Multimodal.MediaRow]] layout). */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("modality", StringType),
    StructField("payload", BinaryType),
    StructField("byte_len", LongType)))

  /** Streaming DF over a directory where media parquet batches land. */
  def readMedia(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Map-only decode + dHash on the stream itself: one `(id, phash)`
   *  row per media row, no state, no shuffle. */
  def hashStream(spark: SparkSession, media: DataFrame): DataFrame =
    Multimodal.imagePhash(spark, media).toDF()

  /** Drop every stream image whose hash is already in the stored
   *  state — a stream-static anti-join, fully inside the streaming
   *  plan. Near-duplicates pass through (their classification needs
   *  [[classifyStream]]). */
  def exactDedupStream(spark: SparkSession, media: DataFrame, state: DataFrame): DataFrame =
    hashStream(spark, media).join(state.select(col("phash")), Seq("phash"), "left_anti")

  /** Full exact/near/fresh classification per micro-batch: each batch
   *  of hashed rows runs the batch operator against the same stored
   *  state, and `onBatch` receives the classified frame. The caller
   *  owns state evolution (fold accepted batches with
   *  [[Multimodal.phashStateUpdate]] and restart, or keep the state
   *  frozen for a pure classification pass). */
  def classifyStream(spark: SparkSession, media: DataFrame, state: DataFrame,
                     maxHamming: Int = 4)(onBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    import spark.implicits._
    hashStream(spark, media).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        onBatch(Multimodal.phashIncremental(batch.as[Multimodal.PhashRow], state, maxHamming), id)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }
}
