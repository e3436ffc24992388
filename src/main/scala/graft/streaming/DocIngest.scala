package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Structured Streaming face of CONTINUOUS corpus ingest: a document
 * stream deduplicated against a static historical corpus as it
 * arrives — the streaming form of
 * [[graft.operators.Dedup.incrementalDedup]], for the pipeline where
 * crawl batches land as files and must be dropped-if-seen before
 * they reach training storage.
 *
 * The plan is STATELESS on the stream side, so it runs in append
 * mode with no watermark and state bounded by the STATIC history
 * summary only: the Bloom filter ships once per executor (bloom-
 * negative rows pass MAP-ONLY — no false negatives, provably novel),
 * and only the positive sliver rides a stream-static LEFT ANTI join
 * against the slim fingerprint frame (a supported stream-static join
 * shape — the static side builds once, every micro-batch probes it).
 * Duplicates WITHIN the stream are not this operator's contract
 * (history-dedup only); chain `dropDuplicates` with a watermark for
 * intra-stream exactness, or fold each accepted batch into the
 * history fingerprints between micro-batches.
 */
object DocIngest {

  /** documents.parquet schema for the file-source stream. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming DF over a directory where document parquet batches land. */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** The slim static history summary (NULL-fp rows dropped — they can
   *  never match). Persist or store this; it is read every micro-batch. */
  def historyFingerprints(history: DataFrame, textCol: String): DataFrame =
    history.select(graft.operators.TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .filter(col("__fp").isNotNull)

  /**
   * Dedup the document stream against [[historyFingerprints]] output:
   * same drop semantics as the batch operator (content fingerprint
   * already in history ⇒ dropped; NULL-text rows dropped — their
   * fingerprint is NULL, failing both branches).
   */
  def incrementalDedupStream(docs: DataFrame, historyFps: DataFrame, textCol: String,
                             logM: Int = 16, k: Int = 4): DataFrame = {
    val words = graft.operators.Sketch.bloomBuild(historyFps, "__fp", logM, k)
    val batch = docs.withColumn("__fp", graft.operators.TextAnalysis.fingerprint(col(textCol)))
    val hit = graft.operators.Sketch.bloomProbe(col("__fp"), words, logM, k)
    val novel = batch.filter(!hit)
    val survivors = batch.filter(hit).join(historyFps, Seq("__fp"), "left_anti")
    novel.unionByName(survivors).drop("__fp")
  }
}
