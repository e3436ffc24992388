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
 * Codecs dispatch per modality through [[codecFor]]: images decode
 * FOR REAL via `javax.imageio` (PNG/JPEG/BMP/GIF ship with the JDK —
 * zero new dependencies); audio/video demux — whose libraries are
 * genuinely absent here — keeps a deterministic stub behind the same
 * seam, so swapping in a real demuxer is a one-line registry change
 * and touches none of the distributed plumbing.
 *
 * Reference analog: the binary-payload handling in lsd2_io.py:163
 * reads real FITS blobs; graft reads FITS in sources/Fits.scala, and
 * [[ImageIoCodec]] makes images the second real-bytes modality.
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
   * Resize: REAL bilinear resampling for images (Java2D — in the
   * JDK, headless-safe), re-encoded as PNG; non-image modalities keep
   * the deterministic byte-decimation stand-in until a real demuxer
   * exists. Same per-partition batched transform either way.
   */
  def resize(spark: SparkSession, media: DataFrame, targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    require(targetW > 0 && targetH > 0, s"target dims must be positive: ${targetW}x$targetH")
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        if (r.modality == "image") {
          val d = resizeImage(r.payload, targetW, targetH)
          ResizedMedia(r.id, r.modality, targetW, targetH, d)
        } else if (r.payload.isEmpty) ResizedMedia(r.id, r.modality, targetW, targetH, Array.emptyByteArray)
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

  /** Decode -> bilinear rescale -> PNG re-encode, all in-JDK. */
  def resizeImage(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(src != null, s"resizeImage: ${payload.length}-byte payload is not a decodable image")
    val dst = new java.awt.image.BufferedImage(targetW, targetH,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, targetW, targetH, null)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", bos)
    bos.toByteArray
  }

  // ------------------------------------------------------ codec registry

  /** A decoded raster: packed 0xRRGGBB pixels, row-major. */
  final case class Decoded(width: Int, height: Int, pixels: Array[Int])

  /** Per-modality codec seam. Implementations must be stateless or
   *  thread-safe: one instance serves all of a partition's rows (and
   *  local[n] shares it across task threads). */
  trait MediaCodec extends Serializable {
    def name: String
    def decode(payload: Array[Byte]): Decoded
  }

  /** REAL image decode via `javax.imageio` — PNG/JPEG/BMP/GIF support
   *  ships with the JDK, so this runs on any executor with no native
   *  libs. Fails loudly on undecodable bytes (a silent null would
   *  poison downstream features with zeros). */
  object ImageIoCodec extends MediaCodec {
    javax.imageio.ImageIO.setUseCache(false) // decode in-memory; no per-task temp files
    val name = "imageio"
    def decode(payload: Array[Byte]): Decoded = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, s"imageio: ${payload.length}-byte payload is not a decodable image")
      val w = img.getWidth; val h = img.getHeight
      val px = new Array[Int](w * h)
      img.getRGB(0, 0, w, h, px, 0, w)
      var i = 0
      while (i < px.length) { px(i) &= 0xffffff; i += 1 } // drop alpha: raster contract is 0xRRGGBB
      Decoded(w, h, px)
    }
  }

  /** Deterministic stand-in for the modalities whose codecs are NOT
   *  in the JDK (audio demux, video frames): same geometry as
   *  [[decodeStub]], grayscale "pixels" from byte content. */
  object ByteStubCodec extends MediaCodec {
    val name = "byte-stub"
    def decode(payload: Array[Byte]): Decoded = {
      val w = 16 + (payload.length % 64)
      val h = 16 + ((payload.length / 64) % 64)
      val px = new Array[Int](w * h)
      var i = 0
      while (i < px.length) {
        val v = if (payload.isEmpty) 0 else payload(i % payload.length) & 0xff
        px(i) = (v << 16) | (v << 8) | v
        i += 1
      }
      Decoded(w, h, px)
    }
  }

  def codecFor(modality: String): MediaCodec = modality match {
    case "image" => ImageIoCodec
    case _       => ByteStubCodec
  }

  /** Position-weighted checksum of a decoded raster — the
   *  SQL-replayable integrity hash a lossless encode→decode round
   *  trip must preserve. Plain BIGINT arithmetic (max term
   *  2^24 x WH per pixel — no overflow below ~2000x2000), so an
   *  engine that cannot decode the image format still verifies the
   *  decode output exactly (see the `multimodal_decode` oracle). */
  def pixHash(d: Decoded): Long = {
    var h = 0L; var i = 0
    while (i < d.pixels.length) {
      val p = d.pixels(i)
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      val x = i % d.width; val y = i / d.width
      h += (r + 256L * g + 65536L * b) * (1L + x + y.toLong * d.width)
      i += 1
    }
    h
  }

  /** 8-dim raster features: mean R/G/B, mean luma per quadrant, and
   *  aspect ratio — the compact embedding stand-in a vision tower
   *  would replace, computed from REAL decoded pixels. */
  def rasterFeatures(d: Decoded): Array[Float] = {
    val f = new Array[Float](8)
    val qw = math.max(1, d.width / 2); val qh = math.max(1, d.height / 2)
    val qn = new Array[Float](4); var i = 0
    while (i < d.pixels.length) {
      val p = d.pixels(i)
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      f(0) += r; f(1) += g; f(2) += b
      val q = (if (i % d.width >= qw) 1 else 0) + (if (i / d.width >= qh) 2 else 0)
      f(3 + q) += (0.299f * r + 0.587f * g + 0.114f * b)
      qn(q) += 1
      i += 1
    }
    val n = math.max(1, d.pixels.length).toFloat
    f(0) /= 255f * n; f(1) /= 255f * n; f(2) /= 255f * n
    var q = 0
    while (q < 4) { f(3 + q) /= 255f * math.max(1f, qn(q)); q += 1 }
    f(7) = d.width.toFloat / math.max(1, d.height)
    f
  }

  final case class DecodedMedia(id: Long, modality: String, width: Int, height: Int,
                                pix_hash: Long, features: Array[Float])

  /** Batched decode through the codec registry: REAL `javax.imageio`
   *  for `modality = "image"`, the stub raster otherwise. Same
   *  mapPartitions shape as [[extractFeatures]] — a codec holding
   *  per-partition native state (demuxer context, GPU handle) slots
   *  in without touching this. */
  def decodeMedia(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val d = codecFor(r.modality).decode(r.payload)
        DecodedMedia(r.id, r.modality, d.width, d.height, pixHash(d), rasterFeatures(d))
      }
    }
  }

  // --------------------------------------------- deterministic test images

  /** Deterministic RGB test pattern: channels are linear in
   *  (id, x, y) mod 256 — exactly replayable in SQL, so the
   *  encode→decode round trip is verifiable by an engine that cannot
   *  decode PNG at all. Nonnegative ids only (SQL `%` twin). */
  def synthPixel(id: Long, x: Int, y: Int): Int = {
    val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
    val g = ((id * 17 + x * 11 + y * 5) % 256).toInt
    val b = ((id * 7 + x * 3 + y * 29) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** W/H schedule for a synthesized image (shared with the SQL twin). */
  def synthDims(id: Long): (Int, Int) = (8 + (id % 5).toInt, 8 + (id % 7).toInt)

  /** Encode the [[synthPixel]] pattern to REAL PNG bytes, one image
   *  per id — distributed (mapPartitions), deterministic, and the
   *  input the `multimodal_decode` oracle round-trips. */
  def synthesizePngs(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRow] = {
    Sampling.requireIntegralId(ids, idCol, "synthesizePngs")
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        require(id >= 0, s"synthesizePngs: negative id $id — the SQL pixel twin assumes nonnegative")
        val (w, h) = synthDims(id)
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, synthPixel(id, x, y)); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val bytes = bos.toByteArray
        MediaRow(id, "image", bytes, bytes.length.toLong)
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
