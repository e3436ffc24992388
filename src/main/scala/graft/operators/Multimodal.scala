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

  final case class ResizedMedia(id: Long, modality: String, width: Int, height: Int, payload: Array[Byte])

  /**
   * STUB resize: stands in for an image resampler. The Spark shape
   * is the real thing — per-partition batched transform producing a
   * new payload column; the "pixels" are a deterministic byte
   * decimation to the target WxH budget.
   */
  def resize(spark: SparkSession, media: DataFrame, targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        if (r.payload.isEmpty) ResizedMedia(r.id, r.modality, targetW, targetH, Array.emptyByteArray)
        else {
          val budget = math.max(1, targetW * targetH)
          val step = math.max(1, r.payload.length / budget)
          val out = new Array[Byte](math.min(budget, math.max(1, r.payload.length / step)))
          var i = 0
          while (i < out.length) { out(i) = r.payload(i * step); i += 1 }
          ResizedMedia(r.id, r.modality, targetW, targetH, out)
        }
      }
    }
  }

  final case class Frame(id: Long, frame_idx: Int, frame_payload: Array[Byte])

  /**
   * STUB frame sampling: treats the payload as a "video" of
   * fixed-size frames and emits every `stride`-th frame — the
   * explode-shaped plumbing (one row per sampled frame) a real
   * demuxer would feed.
   */
  def sampleFrames(spark: SparkSession, media: DataFrame, frameBytes: Int, stride: Int): Dataset[Frame] = {
    // fail at call time, not as an ArithmeticException inside a task
    require(frameBytes > 0 && stride > 0,
      s"frameBytes and stride must be positive: frameBytes=$frameBytes stride=$stride")
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val nFrames = math.max(1, r.payload.length / frameBytes)
      (0 until nFrames by stride).map { fi =>
        val from = fi * frameBytes
        val until = math.min(r.payload.length, from + frameBytes)
        Frame(r.id, fi, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }
}
