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
 * zero new dependencies), and audio decodes FOR REAL via [[WavCodec]]
 * (RIFF/PCM16 is a length-prefixed chunk list — a pure byte walk
 * needs no library). Video demux — whose libraries are genuinely
 * absent here — keeps a deterministic stub behind the same seam, so
 * swapping in a real demuxer is a one-line registry change and
 * touches none of the distributed plumbing.
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

  /** Deterministic stand-in for the one modality whose codec is NOT
   *  in the JDK (video frame demux — audio has the real [[WavCodec]]
   *  path via [[wavFeatures]]): same geometry as [[decodeStub]],
   *  grayscale "pixels" from byte content. */
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

  // --------------------------------------------------------- real audio

  /** Decoded PCM audio: the audio analog of [[Decoded]]. Samples are
   *  signed 16-bit values widened to Int. */
  final case class DecodedAudio(sampleRate: Int, channels: Int, samples: Array[Int])

  /**
   * REAL WAV (RIFF/PCM16) codec — pure chunk-walk over the byte
   * layout, no library needed at all: WAV is a length-prefixed chunk
   * list, so audio joins images as a real-bytes modality with zero
   * new dependencies. Fails loudly on anything that is not
   * PCM 16-bit (a silent fallback would poison features downstream).
   */
  object WavCodec extends Serializable {
    val name = "wav-pcm16"

    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Encode mono PCM16 samples at `sampleRate` into canonical
     *  RIFF/WAVE bytes (44-byte header + little-endian data). */
    def encode(samples: Array[Int], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort)                 // PCM
        .putShort(1.toShort)                 // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2)              // byte rate
        .putShort(2.toShort)                 // block align
        .putShort(16.toShort)                // bits/sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < samples.length) {
        require(samples(i) >= Short.MinValue && samples(i) <= Short.MaxValue,
          s"wav encode: sample $i (${samples(i)}) outside 16-bit range")
        bb.putShort(samples(i).toShort); i += 1
      }
      bb.array()
    }

    /** Decode RIFF/WAVE PCM16 bytes. Walks the chunk list (honoring
     *  the odd-size pad byte), so extra chunks (LIST/INFO) between
     *  fmt and data are fine. */
    def decode(payload: Array[Byte]): DecodedAudio = {
      require(payload.length >= 44 && tag(payload, 0) == "RIFF" && tag(payload, 8) == "WAVE",
        s"wav decode: ${payload.length}-byte payload is not a RIFF/WAVE stream")
      var off = 12
      var rate = -1; var channels = -1; var bits = -1
      var samples: Array[Int] = null
      while (off + 8 <= payload.length) {
        val id = tag(payload, off); val size = le32(payload, off + 4)
        require(size >= 0 && off + 8 + size <= payload.length,
          s"wav decode: chunk '$id' at $off claims $size bytes past end of payload")
        id match {
          case "fmt " =>
            require(size >= 16, s"wav decode: fmt chunk too short ($size bytes)")
            val fmt = le16(payload, off + 8)
            require(fmt == 1, s"wav decode: only PCM (format 1) supported, got format $fmt")
            channels = le16(payload, off + 10)
            rate = le32(payload, off + 12)
            bits = le16(payload, off + 22)
            require(bits == 16, s"wav decode: only 16-bit PCM supported, got $bits-bit")
            require(channels == 1, s"wav decode: only mono supported, got $channels channels")
          case "data" =>
            require(rate > 0, "wav decode: data chunk before fmt chunk")
            val n = size / 2
            samples = new Array[Int](n)
            var i = 0
            while (i < n) { samples(i) = le16(payload, off + 8 + 2 * i).toShort.toInt; i += 1 }
          case _ => // skip LIST/INFO/etc.
        }
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
      require(samples != null, "wav decode: no data chunk found")
      DecodedAudio(rate, channels, samples)
    }
  }

  /** Plain-Long twin of the column-level two-round mixer
   *  (`Sketch.mixCol` / `Sampling.knuthHash`) — byte-building code
   *  runs per sample inside a tight loop where constructing Columns
   *  is impossible. MUST stay in lockstep with `Sampling.knuthHash`
   *  and `Sampling.knuthHashSql`; `MultimodalSpec` pins the three-way
   *  agreement over a key sweep. */
  private[operators] def mixLong(key: Long): Long = {
    def knuth32(x: Long): Long = {
      val C = 2654435761L
      val folded = x ^ (x >>> 32)
      val idm = ((folded % 4294967296L) + 4294967296L) % 4294967296L
      ((((idm >> 16) * C % 4294967296L) << 16) + (idm & 0xffffL) * C) % 4294967296L
    }
    val h1 = knuth32(key)
    knuth32(h1 ^ (h1 >>> 16))
  }

  /** Deterministic PCM test signal: sample i of clip id is a pure
   *  integer function of mix(id * 4096 + i) — nonzero by construction
   *  (zero-crossing counts stay sign-unambiguous), exactly replayable
   *  in SQL, so the encode→decode→feature path is verifiable by an
   *  engine that cannot parse WAV at all. Requires i < 4096. */
  def synthSample(id: Long, i: Int): Int = {
    val h = mixLong(id * 4096L + i)
    val mag = (h % 9999L).toInt + 1
    if (((h >> 14) & 1L) == 0L) mag else -mag
  }

  /** Sample-count schedule for a synthesized clip (shared with the
   *  SQL twin): 256..640 samples, well under the 4096 key-packing
   *  bound. */
  def synthNumSamples(id: Long): Int = 256 + (id % 7).toInt * 64

  /** Sample rate of every synthesized clip: 8 kHz mono. 125 us per
   *  sample exactly, so durations are integer microseconds. */
  val SynthSampleRate = 8000

  /** Encode the [[synthSample]] signal to REAL WAV bytes, one clip
   *  per id — distributed (mapPartitions), deterministic, the input
   *  the `multimodal_audio` oracle round-trips. */
  def synthesizeWavs(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRow] = {
    Sampling.requireIntegralId(ids, idCol, "synthesizeWavs")
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        require(id >= 0, s"synthesizeWavs: negative id $id — the SQL sample twin assumes nonnegative")
        val n = synthNumSamples(id)
        val samples = Array.tabulate(n)(i => synthSample(id, i))
        val bytes = WavCodec.encode(samples, SynthSampleRate)
        MediaRow(id, "audio", bytes, bytes.length.toLong)
      }
    }
  }

  /** Integer-exact per-clip audio features, all from DECODED samples:
   *  duration, total/peak magnitude, energy, zero crossings. Longs
   *  throughout so any engine hashes identically. */
  final case class AudioFeats(id: Long, n_samples: Long, sample_rate: Long, duration_us: Long,
                              sum_abs: Long, peak: Long, energy: Long, zero_crossings: Long)

  /**
   * Batched WAV decode + feature extraction: each row is one clip, so
   * the whole operator is MAP-ONLY — decode and the per-clip fold
   * happen in one pass with nothing shuffled (the 100 TB shape: audio
   * feature extraction is embarrassingly parallel and must stay so).
   */
  def wavFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioFeats] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val d = WavCodec.decode(r.payload)
        var sumAbs = 0L; var peak = 0L; var energy = 0L; var zc = 0L
        var i = 0
        while (i < d.samples.length) {
          val v = d.samples(i); val a = math.abs(v).toLong
          sumAbs += a; if (a > peak) peak = a; energy += v.toLong * v
          if (i > 0 && (d.samples(i - 1) < 0) != (v < 0)) zc += 1
          i += 1
        }
        AudioFeats(r.id, d.samples.length.toLong, d.sampleRate.toLong,
          d.samples.length.toLong * 1000000L / d.sampleRate, sumAbs, peak, energy, zc)
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
