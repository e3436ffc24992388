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
 * Codecs dispatch per modality through [[codecFor]], and every
 * modality is REAL BYTES now: images decode via `javax.imageio`
 * (PNG/JPEG/BMP/GIF ship with the JDK — zero new dependencies),
 * audio via [[WavCodec]] (RIFF/PCM16 — a pure byte walk), and video
 * via [[AviCodec]] — an uncompressed RIFF/AVI (BI_RGB 24-bit DIB
 * frames) container demuxer/muxer in the same chunk-walk style as
 * WAV, lossless by construction so frame pixels round-trip exactly
 * and the decode is SQL-oracle-verifiable. Unknown modalities fail
 * loudly instead of faking a raster.
 *
 * Reference analog: the binary-payload handling in lsd2_io.py:163
 * reads real FITS blobs; graft reads FITS in sources/Fits.scala, and
 * the imageio/WAV/AVI codecs make images, audio and video real-bytes
 * modalities the same way.
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
   * Batched decode/feature-extract over REAL codecs: typed
   * mapPartitions so a codec could hold per-partition native state
   * (decoder context, GPU handle) exactly as a `mapInPandas` batch
   * would. Dispatches through [[codecFor]] — image and video rows
   * decode their actual bytes; anything else fails loudly.
   */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val d = codecFor(r.modality).decode(r.payload)
        MediaFeatures(r.id, r.modality, r.byte_len, d.width, d.height, rasterFeatures(d))
      }
    }
  }

  final case class ResizedMedia(id: Long, modality: String, width: Int, height: Int, payload: Array[Byte])

  /**
   * Resize: REAL bilinear resampling (Java2D — in the JDK,
   * headless-safe). Images re-encode as PNG; videos demux, resize
   * every frame, and re-mux as uncompressed AVI at the original
   * frame rate. Same per-partition batched transform either way.
   */
  def resize(spark: SparkSession, media: DataFrame, targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    require(targetW > 0 && targetH > 0, s"target dims must be positive: ${targetW}x$targetH")
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val out = r.modality match {
          case "image" => resizeImage(r.payload, targetW, targetH)
          case "video" =>
            val v = AviCodec.decode(r.payload)
            AviCodec.encode(v.frames.map(resizeRaster(_, targetW, targetH)), v.fps)
          case m => throw new IllegalArgumentException(
            s"resize: unsupported modality '$m' (image and video resize; audio has no raster)")
        }
        ResizedMedia(r.id, r.modality, targetW, targetH, out)
      }
    }
  }

  /** Bilinear raster-to-raster resize via Java2D (shared by the image
   *  and per-video-frame paths). */
  def resizeRaster(src: Decoded, targetW: Int, targetH: Int): Decoded = {
    val img = new java.awt.image.BufferedImage(src.width, src.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, src.width, src.height, src.pixels, 0, src.width)
    val dst = new java.awt.image.BufferedImage(targetW, targetH,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, targetW, targetH, null)
    } finally g.dispose()
    val px = new Array[Int](targetW * targetH)
    dst.getRGB(0, 0, targetW, targetH, px, 0, targetW)
    var i = 0
    while (i < px.length) { px(i) &= 0xffffff; i += 1 }
    Decoded(targetW, targetH, px)
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

  /** REAL video-as-raster face: first frame of the AVI payload (the
   *  thumbnail/keyframe convention). Full-sequence demux is
   *  [[decodeVideoFrames]]. */
  object AviFirstFrameCodec extends MediaCodec {
    val name = "avi-first-frame"
    def decode(payload: Array[Byte]): Decoded = AviCodec.decode(payload).frames.head
  }

  def codecFor(modality: String): MediaCodec = modality match {
    case "image" => ImageIoCodec
    case "video" => AviFirstFrameCodec
    case m => throw new IllegalArgumentException(
      s"codecFor: no raster codec for modality '$m' — image and video decode to rasters; " +
        "audio goes through wavFeatures")
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
   *  for `modality = "image"`, REAL AVI first-frame demux for
   *  `"video"`. Same mapPartitions shape as [[extractFeatures]] — a
   *  codec holding per-partition native state (demuxer context, GPU
   *  handle) slots in without touching this. */
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
   * Byte-window frame sampling: slices the payload into fixed-size
   * windows and emits every `stride`-th one — the explode-shaped
   * plumbing (one row per sampled frame) for formats with flat
   * fixed-stride layouts (raw planar buffers, fixed-block sensor
   * dumps). Container formats with real frame boundaries use
   * [[decodeVideoFrames]] instead.
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

  // --------------------------------------------------------- real video

  /** A demuxed video: frame rasters in presentation order. */
  final case class DecodedVideo(fps: Int, frames: Seq[Decoded])

  /**
   * REAL AVI (RIFF 'AVI ') container codec for uncompressed BI_RGB
   * 24-bit DIB frames — the same pure chunk-walk style as
   * [[WavCodec]], zero libraries: RIFF is a length-prefixed chunk
   * tree, and uncompressed DIB frames are bottom-up BGR rows padded
   * to 4 bytes. Lossless by construction (no DCT), so demuxed pixels
   * equal the muxed pixels EXACTLY and the decode is verifiable by an
   * engine that cannot parse AVI at all (the `multimodal_video`
   * oracle replays the synthesized pattern in SQL). Encode writes the
   * standard hdrl (avih + strl/strh/strf) headers plus an idx1 index,
   * so players and other demuxers read the output too. Fails loudly
   * on compressed or non-24-bit payloads — a silent fallback would
   * poison downstream features.
   */
  object AviCodec extends Serializable {
    val name = "avi-dib24"

    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    private def rowBytes(w: Int): Int = (3 * w + 3) & ~3 // DIB rows pad to 4 bytes

    /** Mux same-sized rasters as an uncompressed AVI at `fps`. */
    def encode(frames: Seq[Decoded], fps: Int): Array[Byte] = {
      require(frames.nonEmpty, "avi encode: no frames")
      require(fps > 0, s"avi encode: fps must be positive (got $fps)")
      val w = frames.head.width; val h = frames.head.height
      require(frames.forall(f => f.width == w && f.height == h),
        "avi encode: all frames must share one geometry")
      val rb = rowBytes(w)
      val frameBytes = rb * h
      val n = frames.length
      val moviData = 4 + n * (8 + frameBytes)          // "movi" + chunks
      val idx1Data = 16 * n
      val hdrlData = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40)) // "hdrl" avih LIST(strl strh strf)
      val riffData = 4 + (8 + hdrlData) + (8 + moviData) + (8 + idx1Data)
      val bb = java.nio.ByteBuffer.allocate(8 + riffData)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
      fourcc("RIFF"); bb.putInt(riffData); fourcc("AVI ")
      fourcc("LIST"); bb.putInt(hdrlData); fourcc("hdrl")
      fourcc("avih"); bb.putInt(56)
      bb.putInt(1000000 / fps)                          // usPerFrame
        .putInt(frameBytes * fps)                       // maxBytesPerSec
        .putInt(0)                                      // padding granularity
        .putInt(0x10)                                   // AVIF_HASINDEX
        .putInt(n).putInt(0).putInt(1)                  // totalFrames, initialFrames, streams
        .putInt(frameBytes)                             // suggestedBufferSize
        .putInt(w).putInt(h)
        .putInt(0).putInt(0).putInt(0).putInt(0)        // reserved
      fourcc("LIST"); bb.putInt(4 + (8 + 56) + (8 + 40)); fourcc("strl")
      fourcc("strh"); bb.putInt(56)
      fourcc("vids"); fourcc("DIB ")
      bb.putInt(0).putShort(0.toShort).putShort(0.toShort).putInt(0) // flags, prio, lang, initial
        .putInt(1).putInt(fps)                          // scale, rate -> rate/scale fps
        .putInt(0).putInt(n)                            // start, length (frames)
        .putInt(frameBytes).putInt(-1).putInt(0)        // bufSize, quality, sampleSize
        .putShort(0.toShort).putShort(0.toShort)        // rcFrame
        .putShort(w.toShort).putShort(h.toShort)
      fourcc("strf"); bb.putInt(40)
      bb.putInt(40).putInt(w).putInt(h)                 // biSize, width, height (bottom-up)
        .putShort(1.toShort).putShort(24.toShort)       // planes, bitCount
        .putInt(0)                                      // BI_RGB
        .putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
      fourcc("LIST"); bb.putInt(moviData); fourcc("movi")
      frames.foreach { f =>
        fourcc("00db"); bb.putInt(frameBytes)
        var y = h - 1                                   // bottom-up rows
        while (y >= 0) {
          var x = 0
          while (x < w) {
            val p = f.pixels(y * w + x)
            bb.put((p & 0xff).toByte)                   // B
              .put(((p >> 8) & 0xff).toByte)            // G
              .put(((p >> 16) & 0xff).toByte)           // R
            x += 1
          }
          var pad = rb - 3 * w
          while (pad > 0) { bb.put(0.toByte); pad -= 1 }
          y -= 1
        }
      }
      fourcc("idx1"); bb.putInt(idx1Data)
      var i = 0
      while (i < n) {
        fourcc("00db"); bb.putInt(0x10)                 // AVIIF_KEYFRAME
        bb.putInt(4 + i * (8 + frameBytes)).putInt(frameBytes)
        i += 1
      }
      bb.array()
    }

    /** Demux an uncompressed AVI back to rasters. Walks the chunk
     *  tree (word-aligned, extra chunks skipped), validates the strf
     *  geometry (BI_RGB, 24-bit), then converts each 00db/00dc frame
     *  from bottom-up padded BGR to the row-major 0xRRGGBB raster
     *  contract. */
    def decode(payload: Array[Byte]): DecodedVideo = {
      require(payload.length >= 12 && tag(payload, 0) == "RIFF" && tag(payload, 8) == "AVI ",
        s"avi decode: ${payload.length}-byte payload is not a RIFF/AVI stream")
      var w = -1; var h = -1; var fps = -1
      val frames = scala.collection.mutable.ArrayBuffer.empty[Decoded]

      def walkStrl(off0: Int, end: Int): Unit = {
        var off = off0
        var scale = 1; var rate = -1
        while (off + 8 <= end) {
          val id = tag(payload, off); val size = le32(payload, off + 4)
          require(size >= 0 && off + 8 + size <= end,
            s"avi decode: chunk '$id' at $off claims $size bytes past its list")
          id match {
            case "strh" =>
              require(size >= 56, s"avi decode: strh too short ($size)")
              if (tag(payload, off + 8) == "vids") {
                // strh: fccType(4) fccHandler(4) flags(4) prio(2)
                // lang(2) initialFrames(4) -> scale at 20, rate at 24
                scale = le32(payload, off + 8 + 20); rate = le32(payload, off + 8 + 24)
                require(scale > 0 && rate > 0, s"avi decode: bad vids rate $rate/$scale")
                fps = rate / scale
              }
            case "strf" if fps > 0 && w < 0 =>
              require(size >= 40, s"avi decode: strf too short ($size)")
              w = le32(payload, off + 8 + 4); h = le32(payload, off + 8 + 8)
              val bits = le16(payload, off + 8 + 14); val comp = le32(payload, off + 8 + 16)
              require(comp == 0, s"avi decode: only uncompressed BI_RGB supported, got compression $comp")
              require(bits == 24, s"avi decode: only 24-bit DIB supported, got $bits-bit")
              require(w > 0 && h > 0, s"avi decode: bad geometry ${w}x$h")
          }
          off += 8 + size + (size & 1)
        }
      }

      def walkList(off0: Int, end: Int): Unit = {
        var off = off0
        while (off + 8 <= end) {
          val id = tag(payload, off); val size = le32(payload, off + 4)
          require(size >= 0 && off + 8 + size <= end,
            s"avi decode: chunk '$id' at $off claims $size bytes past its list")
          if (id == "LIST") {
            val kind = tag(payload, off + 8)
            if (kind == "hdrl" || kind == "movi") walkList(off + 12, off + 8 + size)
            else if (kind == "strl") walkStrl(off + 12, off + 8 + size)
          } else if (id == "00db" || id == "00dc") {
            require(w > 0, "avi decode: frame chunk before the strf geometry header")
            val rb = rowBytes(w)
            require(size >= rb * h, s"avi decode: frame chunk $size bytes < ${rb * h} for ${w}x$h")
            val px = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              val ro = off + 8 + (h - 1 - y) * rb        // bottom-up source row
              var x = 0
              while (x < w) {
                val o = ro + 3 * x
                px(y * w + x) = ((payload(o + 2) & 0xff) << 16) |
                  ((payload(o + 1) & 0xff) << 8) | (payload(o) & 0xff)
                x += 1
              }
              y += 1
            }
            frames += Decoded(w, h, px)
          }
          off += 8 + size + (size & 1)
        }
      }

      walkList(12, math.min(payload.length, 8 + le32(payload, 4)))
      require(frames.nonEmpty, "avi decode: no frame chunks found")
      DecodedVideo(if (fps > 0) fps else 1, frames.toSeq)
    }
  }

  /** Deterministic per-frame RGB test pattern — [[synthPixel]] with a
   *  frame term, linear mod 256, exactly replayable in SQL so the
   *  mux→demux round trip is verifiable by an engine that cannot
   *  parse AVI at all. */
  def synthVideoPixel(id: Long, f: Int, x: Int, y: Int): Int = {
    val r = ((id * 31 + f * 19 + x * 7 + y * 13) % 256).toInt
    val g = ((id * 17 + f * 23 + x * 11 + y * 5) % 256).toInt
    val b = ((id * 7 + f * 37 + x * 3 + y * 29) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Frame-count schedule for a synthesized clip (shared with the SQL
   *  twin): 2..5 frames. Dims reuse [[synthDims]]. */
  def synthNumFrames(id: Long): Int = 2 + (id % 4).toInt

  /** Frame rate of every synthesized clip. */
  val SynthFps = 8

  /** Mux the [[synthVideoPixel]] pattern to REAL AVI bytes, one clip
   *  per id — distributed (mapPartitions), deterministic, the input
   *  the `multimodal_video` oracle round-trips. */
  def synthesizeAvis(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRow] = {
    Sampling.requireIntegralId(ids, idCol, "synthesizeAvis")
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        require(id >= 0, s"synthesizeAvis: negative id $id — the SQL pixel twin assumes nonnegative")
        val (w, h) = synthDims(id)
        val frames = (0 until synthNumFrames(id)).map { f =>
          val px = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { px(y * w + x) = synthVideoPixel(id, f, x, y); x += 1 }
            y += 1
          }
          Decoded(w, h, px)
        }
        val bytes = AviCodec.encode(frames, SynthFps)
        MediaRow(id, "video", bytes, bytes.length.toLong)
      }
    }
  }

  final case class VideoFrame(id: Long, frame_idx: Int, width: Int, height: Int,
                              pix_hash: Long, features: Array[Float])

  /**
   * REAL frame demux: every `stride`-th frame of each AVI payload as
   * one row with its raster checksum + features — the explode shape
   * frame-level training pipelines consume (frame dedup, per-frame
   * captioning, keyframe selection). MAP-ONLY: demux and the
   * per-frame folds run in one pass, nothing shuffles — at 100 TB,
   * frame extraction is embarrassingly parallel and must stay so.
   */
  def decodeVideoFrames(spark: SparkSession, media: DataFrame, stride: Int = 1): Dataset[VideoFrame] = {
    require(stride > 0, s"decodeVideoFrames: stride must be positive (got $stride)")
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val v = AviCodec.decode(r.payload)
      (0 until v.frames.length by stride).map { fi =>
        val d = v.frames(fi)
        VideoFrame(r.id, fi, d.width, d.height, pixHash(d), rasterFeatures(d))
      }
    }
  }

  // ------------------------------------------- video scene detection

  final case class Keyframe(id: Long, frame_idx: Int, frame_delta: Long)

  /**
   * Scene-change / keyframe detection over REAL demuxed AVI frames:
   * a frame is a keyframe when the exact integer sum of absolute
   * per-channel differences against the PREVIOUS frame exceeds a
   * mean-per-channel threshold (`meanDelta10` = threshold x 10, so
   * "mean > 20.0" is the integer predicate `10*delta > 200*3*w*h` —
   * no IEEE division anywhere). Frame 0 is always a keyframe with
   * delta sentinel -1 (no predecessor). MAP-ONLY: demux, the
   * consecutive-frame fold and the threshold run in one pass per
   * clip, nothing shuffles — the 100 TB shape for keyframe sampling
   * (the frames a captioning/vision stage should look at).
   */
  def sceneChanges(spark: SparkSession, media: DataFrame, meanDelta10: Int = 200): Dataset[Keyframe] = {
    require(meanDelta10 > 0, s"sceneChanges: meanDelta10 must be positive (got $meanDelta10)")
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val v = AviCodec.decode(r.payload)
      val out = scala.collection.mutable.ArrayBuffer.empty[Keyframe]
      var fi = 0
      while (fi < v.frames.length) {
        val d = v.frames(fi)
        if (fi == 0) out += Keyframe(r.id, 0, -1L)
        else {
          val p = v.frames(fi - 1)
          require(p.width == d.width && p.height == d.height,
            s"sceneChanges: frame ${fi} of clip ${r.id} changed dimensions mid-clip")
          var s = 0L; var i = 0
          while (i < d.pixels.length) {
            val a = d.pixels(i); val b = p.pixels(i)
            s += math.abs(((a >> 16) & 0xff) - ((b >> 16) & 0xff)) +
              math.abs(((a >> 8) & 0xff) - ((b >> 8) & 0xff)) +
              math.abs((a & 0xff) - (b & 0xff))
            i += 1
          }
          if (10L * s > meanDelta10.toLong * 3L * d.width * d.height)
            out += Keyframe(r.id, fi, s)
        }
        fi += 1
      }
      out
    }
  }

  /** Scene-structured pixel pattern: content is constant per SCENE
   *  (s = f/4) except a small per-frame motion wiggle (+1/+2/+1 per
   *  channel per in-scene step, mod 256), so consecutive in-scene
   *  frames differ by ~8*w*h total while scene boundaries jump to
   *  ~256*w*h — the separation [[sceneChanges]]' threshold cuts.
   *  Exactly replayable in SQL (shared with the keyframes oracle). */
  def synthScenePixel(id: Long, f: Int, x: Int, y: Int): Int = {
    val s = f / 4
    val r = ((id * 31 + s * 19 + x * 7 + y * 13 + (f % 4)) % 256).toInt
    val g = ((id * 17 + s * 23 + x * 11 + y * 5 + 2 * (f % 4)) % 256).toInt
    val b = ((id * 7 + s * 37 + x * 3 + y * 29 + (f % 4)) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Frame-count schedule for a scene-structured clip: 12..28 frames
   *  = 3..7 scenes of 4 (shared with the SQL twin). */
  def synthSceneFrames(id: Long): Int = 12 + (id % 5).toInt * 4

  /** Mux the [[synthScenePixel]] pattern to REAL AVI bytes — the
   *  input the `multimodal_keyframes` oracle replays. */
  def synthesizeSceneAvis(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRow] = {
    Sampling.requireIntegralId(ids, idCol, "synthesizeSceneAvis")
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        require(id >= 0, s"synthesizeSceneAvis: negative id $id — the SQL pixel twin assumes nonnegative")
        val (w, h) = synthDims(id)
        val frames = (0 until synthSceneFrames(id)).map { f =>
          val px = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { px(y * w + x) = synthScenePixel(id, f, x, y); x += 1 }
            y += 1
          }
          Decoded(w, h, px)
        }
        val bytes = AviCodec.encode(frames, SynthFps)
        MediaRow(id, "video", bytes, bytes.length.toLong)
      }
    }
  }

  // ------------------------------------------- perceptual image dedup

  /** Integer luminance (BT.709 weights x 10000 — no float rounding,
   *  so any engine compares pixels identically). */
  @inline private def lum10k(p: Int): Int =
    2126 * ((p >> 16) & 0xff) + 7152 * ((p >> 8) & 0xff) + 722 * (p & 0xff)

  /** 56-bit difference hash (dHash) of a decoded raster: sample an
   *  8x8 luminance grid at integer coordinates `(i*w/8, j*h/8)`
   *  (truncating division — nearest-neighbor, NOT area-averaged, so
   *  the SQL twin replays it with two integer divides), then compare
   *  horizontally adjacent cells; bit `j*7+i` is set when cell
   *  `(i+1, j)` is brighter than `(i, j)`. 56 bits (7 comparisons x
   *  8 rows) keeps the hash strictly positive in a signed 64-bit
   *  lane, so BIGINT engines agree without unsigned reinterpretation.
   *  Comparisons (not absolute values) make the hash invariant to
   *  global brightness/contrast shifts — the property that turns it
   *  into a NEAR-duplicate key rather than a checksum. */
  def dHash(d: Decoded): Long = {
    val gl = new Array[Int](64)
    var j = 0
    while (j < 8) {
      val y = j * d.height / 8
      var i = 0
      while (i < 8) {
        val x = i * d.width / 8
        gl(j * 8 + i) = lum10k(d.pixels(y * d.width + x))
        i += 1
      }
      j += 1
    }
    var h = 0L; var k = 0; j = 0
    while (j < 8) {
      var i = 0
      while (i < 7) {
        if (gl(j * 8 + i + 1) > gl(j * 8 + i)) h |= 1L << k
        k += 1; i += 1
      }
      j += 1
    }
    h
  }

  final case class PhashRow(id: Long, phash: Long)

  /** Per-image perceptual hash over REAL decoded bytes — MAP-ONLY
   *  (decode + dHash fused in one pass; at 100 TB, hashing the image
   *  corpus is embarrassingly parallel and must stay so). The raster
   *  codec dispatches per modality, so video rows hash by their first
   *  frame (the thumbnail convention). */
  def imagePhash(spark: SparkSession, media: DataFrame): Dataset[PhashRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map(r => PhashRow(r.id, dHash(codecFor(r.modality).decode(r.payload))))
    }
  }

  /**
   * Perceptual near-duplicate image pairs: collapse identical hashes
   * into exact-dup groups FIRST, then band the DISTINCT 56-bit
   * hashes into Hamming-pigeonhole chunks and bucket-join — the
   * image face of the text SimHash machinery
   * ([[Dedup.simhashPairsFromSigs]] consumes the `(id, simhash)`
   * frame directly, so band geometry, first-matching-chunk dedup and
   * the bit_count verify are ONE shared implementation, never an
   * O(n^2) raster comparison).
   *
   * The distinct-first collapse is the 100 TB load-bearing step: web
   * corpora carry MILLIONS of byte-identical thumbnails/blanks, and
   * banding raw rows would put every copy in the same buckets —
   * candidate pairs grow with multiplicity SQUARED (a 32x-replicated
   * probe corpus hit 2.0e9 pairs before this collapse; group-level
   * it is thousands). Join cost scales with genuine hash diversity
   * instead; group sizes travel alongside so downstream clustering /
   * keep-one logic works at group granularity without re-exploding.
   *
   * Output: one row per near-duplicate GROUP pair — `id_a`/`id_b`
   * are the groups' representative (minimum) image ids, with
   * `n_a`/`n_b` group sizes and the exact `phash_hamming`. Exact
   * duplicates (hamming 0) are the groups themselves — recover them
   * from `hashed.groupBy("phash")`, they are deliberately NOT
   * re-emitted as pairs here.
   */
  def phashNearDup(hashed: Dataset[PhashRow], maxHamming: Int = 4): DataFrame = {
    val groups = phashGroups(hashed)
    val pairs = Dedup.simhashPairsFromSigs(
      groups.select(col("rep_id").as("id"), col("phash").as("simhash")), "id", maxHamming)
      .withColumnRenamed("hamming", "phash_hamming")
    val a = groups.select(col("rep_id").as("id_a"), col("n_images").as("n_a"))
    val b = groups.select(col("rep_id").as("id_b"), col("n_images").as("n_b"))
    pairs.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"), col("phash_hamming"), col("n_a"), col("n_b"))
  }

  /** Distinct-hash groups of an image corpus — the slim incremental
   *  state [[phashIncremental]] band-joins against (the image twin of
   *  [[Dedup.nearDupState]]: hashes only, pixels never re-read). */
  def phashGroups(hashed: Dataset[PhashRow]): DataFrame =
    hashed.toDF().groupBy(col("phash"))
      .agg(min(col("id")).as("rep_id"), count(lit(1)).as("n_images"))

  /**
   * Incremental perceptual image dedup: classify a re-ingest batch
   * against the STORED [[phashGroups]] state of the history corpus —
   * `exact_dup` (hash already in state), `near_dup` (within
   * `maxHamming` of a stored hash; nearest match, ties to the
   * smallest rep), or `fresh`. History images are never re-decoded:
   * the state is hashes + group sizes only. The near pass runs the
   * shared simhash chunk machinery CROSS-corpus over DISTINCT batch
   * hashes ([[Dedup.simhashCrossPairs]]), so candidates are bounded
   * by chunk buckets and copy multiplicity never re-explodes.
   * Output: (id, phash, status, match_rep, hamming) — `match_rep`
   * is the matched group's representative id (null for fresh),
   * `hamming` 0 / distance / null.
   */
  def phashIncremental(batch: Dataset[PhashRow], state: DataFrame,
                       maxHamming: Int = 4): DataFrame = {
    val b = batch.toDF()
    // the hashes needing the near pass: distinct batch hashes absent
    // from state (computed directly — not derived from the exact join,
    // which would recompute that join once per consumer subtree)
    val unmatched = b.select(col("phash")).distinct()
      .join(state.select(col("phash")), Seq("phash"), "left_anti")
    val near = Dedup.simhashCrossPairs(
        unmatched.select(col("phash").as("bhash"), col("phash").as("simhash")), "bhash",
        state.select(col("phash").as("hhash"), col("phash").as("simhash")), "hhash",
        maxHamming)
      .join(state.select(col("phash").as("hhash"), col("rep_id").as("hrep")), Seq("hhash"))
      .groupBy(col("bhash"))
      .agg(min(struct(col("hamming"), col("hrep"))).as("m"))
      .select(col("bhash").as("phash"), col("m.hrep").as("near_rep"),
        col("m.hamming").as("near_hamming"))
    b.join(state.select(col("phash"), col("rep_id")), Seq("phash"), "left")
      .join(near, Seq("phash"), "left")
      .select(col("id"), col("phash"),
        when(col("rep_id").isNotNull, lit("exact_dup"))
          .when(col("near_rep").isNotNull, lit("near_dup"))
          .otherwise(lit("fresh")).as("status"),
        coalesce(col("rep_id"), col("near_rep")).as("match_rep"),
        when(col("rep_id").isNotNull, lit(0L)).otherwise(col("near_hamming")).as("hamming"))
  }

  /** Fold a batch into the stored [[phashGroups]] state: group sizes
   *  sum, representatives stay the global minimum id — commutative
   *  and idempotent-per-batch, so replays cannot corrupt the state. */
  def phashStateUpdate(state: DataFrame, batch: Dataset[PhashRow]): DataFrame =
    state.select(col("phash"), col("rep_id"), col("n_images"))
      .union(phashGroups(batch))
      .groupBy(col("phash"))
      .agg(min(col("rep_id")).as("rep_id"), sum(col("n_images")).as("n_images"))

  /** As [[synthesizePngs]], but pixel CONTENT comes from a separate
   *  pattern key while the row keeps its own id — the deterministic
   *  way to plant exact/near duplicate images under distinct ids for
   *  the perceptual-dedup oracles. `brightness` adds a clamped
   *  constant to every channel (a global exposure shift — the edit
   *  dHash must survive). */
  def synthesizePngsKeyed(spark: SparkSession, ids: DataFrame, idCol: String,
                          patternCol: String, brightness: Int = 0): Dataset[MediaRow] = {
    Sampling.requireIntegralId(ids, idCol, "synthesizePngsKeyed")
    Sampling.requireIntegralId(ids, patternCol, "synthesizePngsKeyed")
    import spark.implicits._
    ids.select(col(idCol).cast("long"), col(patternCol).cast("long")).as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, pat) =>
          require(id >= 0 && pat >= 0,
            s"synthesizePngsKeyed: negative key (id=$id pattern=$pat) — the SQL twin assumes nonnegative")
          val (w, h) = synthDims(pat)
          val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = synthPixel(pat, x, y)
              val px =
                if (brightness == 0) p
                else {
                  def cl(v: Int) = math.min(255, math.max(0, v + brightness))
                  (cl((p >> 16) & 0xff) << 16) | (cl((p >> 8) & 0xff) << 8) | cl(p & 0xff)
                }
              img.setRGB(x, y, px)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val bytes = bos.toByteArray
          MediaRow(id, "image", bytes, bytes.length.toLong)
        }
      }
  }

  // ------------------------------------------------ audio fingerprint

  /** As [[synthesizeWavs]], but sample CONTENT comes from a separate
   *  pattern key while the row keeps its own id (the audio twin of
   *  [[synthesizePngsKeyed]]). `gain10` scales every sample by
   *  `gain10/10` in exact integer arithmetic (trunc toward zero) —
   *  a volume edit the energy-contour fingerprint must survive. */
  def synthesizeWavsKeyed(spark: SparkSession, ids: DataFrame, idCol: String,
                          patternCol: String, gain10: Int = 10): Dataset[MediaRow] = {
    Sampling.requireIntegralId(ids, idCol, "synthesizeWavsKeyed")
    Sampling.requireIntegralId(ids, patternCol, "synthesizeWavsKeyed")
    require(gain10 > 0, s"synthesizeWavsKeyed: gain10 must be positive (got $gain10)")
    import spark.implicits._
    ids.select(col(idCol).cast("long"), col(patternCol).cast("long")).as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, pat) =>
          require(id >= 0 && pat >= 0,
            s"synthesizeWavsKeyed: negative key (id=$id pattern=$pat) — the SQL twin assumes nonnegative")
          val n = synthNumSamples(pat)
          val samples = Array.tabulate(n) { i =>
            val v = synthSample(pat, i).toLong * gain10 / 10
            math.max(-32768L, math.min(32767L, v)).toInt
          }
          val bytes = WavCodec.encode(samples, SynthSampleRate)
          MediaRow(id, "audio", bytes, bytes.length.toLong)
        }
      }
  }

  final case class AudioFp(id: Long, n_samples: Long, fingerprint: String)

  /**
   * Energy-contour audio fingerprint over REAL decoded WAV bytes:
   * window the PCM stream into fixed `window`-sample frames (the
   * trailing partial frame is dropped — its energy depends on clip
   * padding, not content), compute each frame's exact integer energy
   * `sum(v^2)`, and emit one bit per adjacent frame pair — '1' when
   * energy rises. The bit string is the direction of the loudness
   * contour: invariant under uniform volume scaling (comparisons,
   * not magnitudes) and variable-length (longer clips carry more
   * bits), so it is a STRING key, not a packed word. MAP-ONLY:
   * decode, window fold and bit emission fuse into one pass per clip
   * — the 100 TB shape for fingerprinting an audio corpus.
   */
  def audioFingerprint(spark: SparkSession, media: DataFrame, window: Int = 16): Dataset[AudioFp] = {
    require(window > 0, s"audioFingerprint: window must be positive (got $window)")
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val d = WavCodec.decode(r.payload)
        val nFrames = d.samples.length / window
        val energy = new Array[Long](nFrames)
        var f = 0
        while (f < nFrames) {
          var e = 0L; var i = f * window; val end = i + window
          while (i < end) { val v = d.samples(i).toLong; e += v * v; i += 1 }
          energy(f) = e; f += 1
        }
        val sb = new java.lang.StringBuilder(math.max(0, nFrames - 1))
        f = 1
        while (f < nFrames) { sb.append(if (energy(f) > energy(f - 1)) '1' else '0'); f += 1 }
        AudioFp(r.id, d.samples.length.toLong, sb.toString)
      }
    }
  }
}
