package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads travel as
 * opaque `binary` columns with typed metadata; decode / feature-
 * extraction runs as a typed mapPartitions over batches (the Scala
 * analog of `mapInPandas`), so codec work amortizes per partition
 * and never touches the driver.
 *
 * The codec itself is STUBBED (no image/audio libraries in this
 * environment) with a deterministic fake decoder; everything around
 * it — schema, batching, partitioning, feature output shape — is
 * real and tested.
 */
object Multimodal {

  final case class MediaRow(id: Long, modality: String, payload: Array[Byte], byte_len: Long)
  final case class MediaFeatures(id: Long, modality: String, byte_len: Long,
                                 width: Int, height: Int, features: Array[Float])

  /** Wrap a text table as a media table (payload = utf-8 bytes), the test stand-in for real blobs. */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String, modality: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      lit(modality).as("modality"),
      encode(col(textCol), "UTF-8").as("payload"))
      .withColumn("byte_len", octet_length(col("payload")).cast("long"))

  /**
   * STUB decoder: stands in for an image/audio codec. Deterministic:
   * fakes a WxH from the byte length and an 8-dim feature vector
   * from byte content. Replace with a real codec binding on a
   * cluster with native libs.
   */
  def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val w = 16 + (payload.length % 64)
    val h = 16 + ((payload.length / 64) % 64)
    val feats = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      feats(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    (w, h, feats)
  }

  /**
   * Batched decode/feature-extract: typed mapPartitions so a real
   * codec could hold per-partition native state (decoder context,
   * GPU handle) exactly as a `mapInPandas` batch would.
   */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (w, h, f) = decodeStub(r.payload)
        MediaFeatures(r.id, r.modality, r.byte_len, w, h, f)
      }
    }
  }
}
