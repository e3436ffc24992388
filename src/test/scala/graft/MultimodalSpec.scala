package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {

  test("media table plumbing: binary payloads, metadata, batched feature extraction") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text", "text")
    assert(media.schema("payload").dataType.typeName == "binary")

    // feature extraction decodes REAL bytes through the codec registry
    val ids = (0L until 30L).toDF("doc_id")
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.synthesizePngs(spark, ids, "doc_id").toDF()).collect()
    assert(feats.length == 30)
    feats.foreach { f =>
      val (w, h) = Multimodal.synthDims(f.id)
      assert(f.features.length == 8 && f.width == w && f.height == h)
      assert(f.modality == "image")
    }
  }

  test("byte-window frame sampling strides the payload") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text", "text")
    val frames = Multimodal.sampleFrames(spark, media, frameBytes = 32, stride = 2)
    val byDoc = frames.collect().groupBy(_.id)
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { fs =>
      assert(fs.map(_.frame_idx).forall(_ % 2 == 0), "only every 2nd frame sampled")
      fs.foreach(f => assert(f.frame_payload.length <= 32 && f.frame_payload.nonEmpty))
    }
  }

  test("byte_len matches utf-8 byte count") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text", "text")
    val joined = media.join(docs, media("id") === docs("doc_id"))
      .select(col("byte_len"), col("text")).collect()
    joined.foreach(r => assert(r.getLong(0) == r.getString(1).getBytes("UTF-8").length))
  }

  test("PNG encode->decode round trip is pixel-identical (real javax.imageio codec)") {
    // driver-side identity: every synthesized pixel survives the codec exactly
    for (id <- Seq(0L, 7L, 123L)) {
      val (w, h) = Multimodal.synthDims(id)
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, Multimodal.synthPixel(id, x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val d = Multimodal.ImageIoCodec.decode(bos.toByteArray)
      assert(d.width == w && d.height == h)
      val expected = for (y <- 0 until h; x <- 0 until w) yield Multimodal.synthPixel(id, x, y)
      assert(d.pixels.toSeq == expected, s"decoded raster differs for id=$id")
    }
  }

  test("distributed decode: imageio dims/hash/features from real pixels; no codec = loud failure") {
    import spark.implicits._
    val ids = (0L until 40L).toDF("doc_id")
    val media = Multimodal.synthesizePngs(spark, ids, "doc_id")
    val decoded = Multimodal.decodeMedia(spark, media.toDF()).collect()
    assert(decoded.length == 40)
    decoded.foreach { d =>
      val (w, h) = Multimodal.synthDims(d.id)
      assert(d.width == w && d.height == h)
      // hash must equal the formula-computed value (what the DuckDB oracle replays)
      var expect = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = Multimodal.synthPixel(d.id, x, y)
        expect += (((p >> 16) & 0xff) + 256L * ((p >> 8) & 0xff) + 65536L * (p & 0xff)) *
          (1L + x + y.toLong * w)
      }
      assert(d.pix_hash == expect, s"pix_hash mismatch for id=${d.id}")
      assert(d.features.length == 8 && d.features.forall(f => !f.isNaN))
    }
    // modalities without a raster codec fail loudly, not fake a raster
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeMedia(spark,
        Seq((1L, "audio", Array[Byte](1, 2, 3), 3L)).toDF("id", "modality", "payload", "byte_len"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("no raster codec")))
  }

  test("image resize is a real bilinear resample (Java2D), not the byte stub") {
    import spark.implicits._
    // constant-color image: bilinear of a constant is the constant,
    // so the resize is exactly checkable through the PNG round trip
    val rgb = (200 << 16) | (120 << 8) | 40
    val img = new java.awt.image.BufferedImage(32, 20, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 20; x <- 0 until 32) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq((7L, "image", bos.toByteArray, bos.size.toLong))
      .toDF("id", "modality", "payload", "byte_len")
    val out = Multimodal.resize(spark, media, 8, 8).collect().head
    val d = Multimodal.ImageIoCodec.decode(out.payload)
    assert(d.width == 8 && d.height == 8, "resized payload must decode to the target dims")
    assert(d.pixels.forall(_ == rgb), "constant image must stay constant through bilinear resize")
  }

  test("imageio codec fails loudly on undecodable bytes") {
    val e = intercept[IllegalArgumentException](
      Multimodal.ImageIoCodec.decode("definitely not a PNG".getBytes("UTF-8")))
    assert(e.getMessage.contains("not a decodable image"))
  }

  test("mixLong is the exact plain-Long twin of the column mixer") {
    import spark.implicits._
    // sweep covers small keys, the 2^32 boundary, and the audio key
    // packing range (id * 4096 + i)
    val keys = Seq(0L, 1L, 5L, 65535L, 65536L, 4096L, 199L * 4096 + 639,
      4294967295L, 4294967296L, (1L << 40) + 17, 123456789012L)
    val kh = graft.operators.SamplingTestAccess.knuthHash _
    val viaColumn = keys.toDF("k")
      .select(kh(kh(col("k")).bitwiseXOR(shiftrightunsigned(kh(col("k")), 16))))
      .as[Long].collect()
    keys.zip(viaColumn).foreach { case (k, expect) =>
      assert(graft.operators.SamplingTestAccess.mixLong(k) == expect,
        s"mixLong($k) diverges from the column mixer")
    }
  }

  test("wav codec: encode→decode round trip is the identity, chunk walk skips extras") {
    val samples = Array(1, -1, 9999, -9999, 32767, -32768, 5, 0)
    val bytes = Multimodal.WavCodec.encode(samples, 8000)
    val d = Multimodal.WavCodec.decode(bytes)
    assert(d.sampleRate == 8000 && d.channels == 1)
    assert(d.samples.toSeq == samples.toSeq, "PCM16 samples must survive exactly")
    // an extra LIST chunk between fmt and data must be skipped, and an
    // ODD-sized one must honor the RIFF pad byte
    for (extraLen <- Seq(4, 5)) {
      val bb = java.nio.ByteBuffer.allocate(bytes.length + 8 + extraLen + (extraLen & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(bytes, 0, 36) // RIFF header + fmt chunk
      bb.put("LIST".getBytes("US-ASCII")).putInt(extraLen)
        .put(new Array[Byte](extraLen + (extraLen & 1)))
      bb.put(bytes, 36, bytes.length - 36) // data chunk
      val withExtra = bb.array()
      // patch RIFF size for the inserted chunk
      val riffLen = bytes.length - 8 + 8 + extraLen + (extraLen & 1)
      withExtra(4) = (riffLen & 0xff).toByte; withExtra(5) = ((riffLen >> 8) & 0xff).toByte
      withExtra(6) = ((riffLen >> 16) & 0xff).toByte; withExtra(7) = ((riffLen >> 24) & 0xff).toByte
      assert(Multimodal.WavCodec.decode(withExtra).samples.toSeq == samples.toSeq,
        s"decode must skip a $extraLen-byte LIST chunk")
    }
  }

  test("wav codec fails loudly on non-WAV and non-PCM16 payloads") {
    val e1 = intercept[IllegalArgumentException](
      Multimodal.WavCodec.decode("RIFFxxxxJUNK".getBytes("US-ASCII")))
    assert(e1.getMessage.contains("not a RIFF/WAVE"))
    // 8-bit PCM: bits field = 8
    val ok = Multimodal.WavCodec.encode(Array(1, 2), 8000)
    ok(34) = 8 // bits/sample lives at offset 34 in the canonical header
    val e2 = intercept[IllegalArgumentException](Multimodal.WavCodec.decode(ok))
    assert(e2.getMessage.contains("16-bit"))
  }

  test("distributed wav features equal the signal formula (what the oracle replays)") {
    import spark.implicits._
    val ids = (0L until 25L).toDF("doc_id")
    val feats = Multimodal.wavFeatures(spark,
      Multimodal.synthesizeWavs(spark, ids, "doc_id").toDF()).collect()
    assert(feats.length == 25)
    feats.foreach { f =>
      val n = Multimodal.synthNumSamples(f.id)
      val vs = Array.tabulate(n)(i => Multimodal.synthSample(f.id, i))
      assert(f.n_samples == n && f.sample_rate == 8000 && f.duration_us == n.toLong * 125)
      assert(f.sum_abs == vs.map(v => math.abs(v).toLong).sum, s"sum_abs id=${f.id}")
      assert(f.peak == vs.map(v => math.abs(v).toLong).max, s"peak id=${f.id}")
      assert(f.energy == vs.map(v => v.toLong * v).sum, s"energy id=${f.id}")
      val zc = (1 until n).count(i => (vs(i - 1) < 0) != (vs(i) < 0))
      assert(f.zero_crossings == zc, s"zero_crossings id=${f.id}")
      assert(vs.forall(_ != 0), "signal is nonzero by construction")
    }
  }

  test("avi codec: mux→demux round trip is pixel-identical, fps survives, extra chunks skipped") {
    val frames = (0 until 3).map { f =>
      val px = Array.tabulate(5 * 4)(i => Multimodal.synthVideoPixel(9L, f, i % 5, i / 5))
      Multimodal.Decoded(5, 4, px) // odd width: exercises the 4-byte row pad
    }
    val bytes = Multimodal.AviCodec.encode(frames, 8)
    val v = Multimodal.AviCodec.decode(bytes)
    assert(v.fps == 8 && v.frames.length == 3)
    v.frames.zip(frames).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got.width == 5 && got.height == 4)
      assert(got.pixels.toSeq == want.pixels.toSeq, s"frame $i pixels must survive exactly")
    }
    // a JUNK chunk inserted before the movi list must be skipped
    val moviAt = {
      var o = 12; var found = -1
      while (found < 0 && o + 12 <= bytes.length) {
        if (new String(bytes, o, 4, "US-ASCII") == "LIST" &&
          new String(bytes, o + 8, 4, "US-ASCII") == "movi") found = o
        else o += 1
      }
      found
    }
    assert(moviAt > 0)
    val bb = java.nio.ByteBuffer.allocate(bytes.length + 12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(bytes, 0, moviAt)
    bb.put("JUNK".getBytes("US-ASCII")).putInt(4).put(new Array[Byte](4))
    bb.put(bytes, moviAt, bytes.length - moviAt)
    val withJunk = bb.array()
    val riffLen = bytes.length - 8 + 12
    withJunk(4) = (riffLen & 0xff).toByte; withJunk(5) = ((riffLen >> 8) & 0xff).toByte
    withJunk(6) = ((riffLen >> 16) & 0xff).toByte; withJunk(7) = ((riffLen >> 24) & 0xff).toByte
    assert(Multimodal.AviCodec.decode(withJunk).frames.length == 3,
      "decode must skip an unknown chunk before movi")
  }

  test("avi codec fails loudly on non-AVI and compressed payloads") {
    val e1 = intercept[IllegalArgumentException](
      Multimodal.AviCodec.decode("RIFFxxxxWAVE not a video".getBytes("US-ASCII")))
    assert(e1.getMessage.contains("not a RIFF/AVI"))
    val ok = Multimodal.AviCodec.encode(Seq(Multimodal.Decoded(2, 2, Array(0, 1, 2, 3))), 4)
    // biCompression lives 16 bytes into the BITMAPINFOHEADER; find strf
    var o = 12; var strfAt = -1
    while (strfAt < 0 && o + 8 <= ok.length) {
      if (new String(ok, o, 4, "US-ASCII") == "strf") strfAt = o
      else o += 1
    }
    ok(strfAt + 8 + 16) = 1 // BI_RLE8
    val e2 = intercept[IllegalArgumentException](Multimodal.AviCodec.decode(ok))
    assert(e2.getMessage.contains("uncompressed"))
  }

  test("distributed video demux: frame hashes equal the pattern formula (what the oracle replays)") {
    import spark.implicits._
    val ids = (0L until 25L).toDF("doc_id")
    val frames = Multimodal.decodeVideoFrames(spark,
      Multimodal.synthesizeAvis(spark, ids, "doc_id").toDF(), stride = 2).collect()
    val byId = frames.groupBy(_.id)
    assert(byId.keySet == (0L until 25L).toSet)
    frames.foreach { fr =>
      val (w, h) = Multimodal.synthDims(fr.id)
      assert(fr.width == w && fr.height == h)
      assert(fr.frame_idx % 2 == 0 && fr.frame_idx < Multimodal.synthNumFrames(fr.id))
      var expect = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = Multimodal.synthVideoPixel(fr.id, fr.frame_idx, x, y)
        expect += (((p >> 16) & 0xff) + 256L * ((p >> 8) & 0xff) + 65536L * (p & 0xff)) *
          (1L + x + y.toLong * w)
      }
      assert(fr.pix_hash == expect, s"pix_hash mismatch id=${fr.id} frame=${fr.frame_idx}")
      assert(fr.features.length == 8 && fr.features.forall(f => !f.isNaN))
    }
    byId.foreach { case (id, fs) =>
      val want = (0 until Multimodal.synthNumFrames(id) by 2).toSet
      assert(fs.map(_.frame_idx).toSet == want, s"id=$id sampled frames")
    }
  }

  test("video resize demuxes, resizes every frame, re-muxes at the original rate") {
    import spark.implicits._
    // constant-color frames: bilinear of a constant is the constant
    val rgb = (10 << 16) | (200 << 8) | 99
    val frames = (0 until 4).map(_ => Multimodal.Decoded(16, 12, Array.fill(16 * 12)(rgb)))
    val avi = Multimodal.AviCodec.encode(frames, 6)
    val media = Seq((3L, "video", avi, avi.length.toLong))
      .toDF("id", "modality", "payload", "byte_len")
    val out = Multimodal.resize(spark, media, 8, 8).collect().head
    val v = Multimodal.AviCodec.decode(out.payload)
    assert(v.fps == 6 && v.frames.length == 4)
    v.frames.foreach { f =>
      assert(f.width == 8 && f.height == 8)
      assert(f.pixels.forall(_ == rgb), "constant frames must stay constant through resize")
    }
  }

  test("dHash: brightness-shift invariance, locality under a local edit, checksum contrast") {
    // horizontal gray ramp: luminance strictly increases with x, so
    // every horizontal comparison is 'brighter' => all 56 bits set
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val base = Multimodal.Decoded(16, 16, Array.tabulate(16 * 16)(i => gray((i % 16) * 12)))
    assert(Multimodal.dHash(base) == (1L << 56) - 1, "strict ramp sets every bit")
    assert((Multimodal.dHash(base) >>> 56) == 0L, "56-bit hash stays in the positive signed range")
    // +20 exposure shift (max channel 180 -> never clamps): same hash, different checksum
    val shifted = Multimodal.Decoded(16, 16, base.pixels.map(p => gray((p & 0xff) + 20)))
    assert(Multimodal.dHash(base) == Multimodal.dHash(shifted),
      "comparisons see identical deltas under a global exposure shift")
    assert(Multimodal.pixHash(base) != Multimodal.pixHash(shifted),
      "the integrity checksum MUST change — that contrast is the point of a perceptual hash")
    // blacking out ONE sampled grid cell — (4,4) is grid cell (2,2) at
    // w=h=16 — flips exactly its left comparison; the right one stays
    // 'brighter' because the neighbor is still positive
    val edited = base.pixels.clone(); edited(4 * 16 + 4) = 0
    val dh = java.lang.Long.bitCount(
      Multimodal.dHash(base) ^ Multimodal.dHash(Multimodal.Decoded(16, 16, edited)))
    assert(dh == 1, s"a single-cell edit flips only comparisons touching that cell (got $dh)")
  }

  test("keyed PNG synth plants exact duplicates; imagePhash groups them; near-dup pairs via banding") {
    import spark.implicits._
    // 12 images, 4 patterns => 4 groups of 3 duplicate images under distinct ids
    val ids = (0L until 12L).map(i => (i, i % 4)).toDF("doc_id", "pattern")
    val media = Multimodal.synthesizePngsKeyed(spark, ids, "doc_id", "pattern").toDF()
    val hashed = Multimodal.imagePhash(spark, media)
    val byHashOfId = hashed.collect().map(r => r.id -> r.phash).toMap
    for (i <- 0L until 12L; j <- 0L until 12L)
      assert((byHashOfId(i) == byHashOfId(j)) || (i % 4) != (j % 4),
        s"same pattern must hash identically: $i vs $j")
    // a +15 exposure edit of pattern 0 (channels for pattern 0 stay low
    // enough on the sampled grid to clamp rarely; assert via hamming bound)
    val editedMedia = Multimodal.synthesizePngsKeyed(
      spark, Seq((100L, 0L)).toDF("doc_id", "pattern"), "doc_id", "pattern", brightness = 15).toDF()
    val editedHash = Multimodal.imagePhash(spark, editedMedia).collect().head.phash
    assert(editedHash == byHashOfId(0L),
      "a clamp-free exposure edit hashes IDENTICALLY (dHash invariance) — it joins the exact group")
    // banded near-dup join runs over DISTINCT hashes: exact copies
    // (including the exposure-edited one) collapse to groups first,
    // pairs connect group representatives; a one-bit-off hash stands
    // in for a genuine local edit
    val all = hashed.toDF()
      .union(Seq((100L, editedHash)).toDF("id", "phash"))
      .union(Seq((200L, editedHash ^ 1L)).toDF("id", "phash"))
      .as[Multimodal.PhashRow]
    val pairs = Multimodal.phashNearDup(all, maxHamming = 4)
      .select("id_a", "id_b", "phash_hamming", "n_a", "n_b")
      .as[(Long, Long, Long, Long, Long)].collect()
    val reps = Set(0L, 1L, 2L, 3L, 200L) // group minima only — copies never re-explode
    pairs.foreach { case (a, b, h, na, nb) =>
      assert(reps(a) && reps(b), s"pairs are between group representatives (got $a, $b)")
      assert(h >= 1, "hamming-0 rows are the groups themselves, not pairs")
      assert(na >= 1 && nb >= 1)
    }
    val hit = pairs.find(p => p._1 == 0L && p._2 == 200L)
    assert(hit.isDefined, "the locally-edited image must pair with its original's group")
    assert(hit.get._3 == 1L, "exact hamming distance carried on the pair")
    assert(hit.get._4 >= 4L && hit.get._5 == 1L,
      "group sizes travel with the pair (>= 3 copies + the exposure-edited one; " +
        "gradient patterns may collide into the same hash group)")
    // NOTE: distinct synth patterns MAY also pair — the linear-gradient
    // test patterns are genuinely perceptually similar across ids, which
    // is correct dHash behavior, so no cross-pattern exclusion here.
  }

  test("scene-change keyframes: scene boundaries found, in-scene motion ignored, threshold monotone") {
    import spark.implicits._
    val ids = (0L until 10L).toDF("doc_id")
    val media = Multimodal.synthesizeSceneAvis(spark, ids, "doc_id").toDF()
    val keys = Multimodal.sceneChanges(spark, media, meanDelta10 = 200).collect()
      .groupBy(_.id).view.mapValues(_.map(k => k.frame_idx -> k.frame_delta).toMap).toMap
    for (id <- 0L until 10L) {
      val nf = Multimodal.synthSceneFrames(id)
      val expected = 0 until nf filter (f => f == 0 || f % 4 == 0)
      assert(keys(id).keySet == expected.toSet,
        s"clip $id: keyframes must be frame 0 + every scene boundary (got ${keys(id).keySet.toSeq.sorted})")
      assert(keys(id)(0) == -1L, "frame 0 carries the no-predecessor sentinel")
      keys(id).filter(_._1 > 0).values.foreach(d => assert(d > 0))
    }
    // an absurd threshold keeps only frame 0 — the cut is monotone in meanDelta10
    val strict = Multimodal.sceneChanges(spark, media, meanDelta10 = 2550).collect()
    assert(strict.length == 10 && strict.forall(_.frame_idx == 0))
    // a mid-clip dimension change fails loudly instead of a silent wrong delta
    val f1 = Multimodal.Decoded(8, 8, Array.fill(64)(0x808080))
    val f2 = Multimodal.Decoded(4, 4, Array.fill(16)(0x808080))
    val avi = Multimodal.AviCodec.encode(Seq(f1, f1), 8) // same-dims OK
    assert(Multimodal.sceneChanges(spark,
      Seq((1L, "video", avi, avi.length.toLong)).toDF("id", "modality", "payload", "byte_len"))
      .collect().map(_.frame_idx).toSeq == Seq(0))
    intercept[Exception] {
      val bad = Multimodal.AviCodec.encode(Seq(f1, f2), 8)
      Multimodal.sceneChanges(spark,
        Seq((2L, "video", bad, bad.length.toLong)).toDF("id", "modality", "payload", "byte_len"))
        .collect()
    }
  }

  test("phashIncremental: exact/near/fresh classification against stored state; state fold") {
    import spark.implicits._
    // fully synthetic hashes so every classification is forced
    val hist = Seq(
      Multimodal.PhashRow(0L, 5L), Multimodal.PhashRow(10L, 5L),      // dup group, rep 0
      Multimodal.PhashRow(1L, 0xFF00L), Multimodal.PhashRow(2L, 0xAAAA00000L)).toDS()
    val state = Multimodal.phashGroups(hist)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batch = Seq(
      Multimodal.PhashRow(100L, 5L),              // exact (rep 0)
      Multimodal.PhashRow(101L, 5L ^ 1L),         // near: hamming 2 vs 5L (bits 0,2)... compute below
      Multimodal.PhashRow(102L, 0xFF00L ^ 3L),    // near: hamming 2 vs 0xFF00
      Multimodal.PhashRow(103L, (1L << 55) - 1)   // far from everything -> fresh
    ).toDS()
    val out = Multimodal.phashIncremental(batch, state, maxHamming = 4)
      .orderBy("id")
      .select("id", "status", "match_rep", "hamming")
      .as[(Long, String, Option[Long], Option[Long])].collect()
    assert(out(0) == ((100L, "exact_dup", Some(0L), Some(0L))))
    assert(out(1)._2 == "near_dup" && out(1)._3 == Some(0L) &&
      out(1)._4 == Some(java.lang.Long.bitCount(5L ^ (5L ^ 1L)).toLong))
    assert(out(2) == ((102L, "near_dup", Some(1L), Some(2L))))
    assert(out(3) == ((103L, "fresh", None, None)))
    // folding the batch into the state makes a replay all-exact, reps stay minimal
    val newState = Multimodal.phashStateUpdate(state, batch)
    val replay = Multimodal.phashIncremental(batch, newState, maxHamming = 4)
      .select("status").as[String].collect()
    assert(replay.forall(_ == "exact_dup"), "after the fold every batch hash is stored")
    val rep5 = newState.filter(col("phash") === 5L)
      .select("rep_id", "n_images").as[(Long, Long)].collect().head
    assert(rep5 == ((0L, 3L)), "rep stays the global min id; sizes sum")
    state.unpersist()
  }

  test("imagePhash dedups VIDEO rows through the codec registry (first-frame thumbnail hash)") {
    import spark.implicits._
    // two identical clips under distinct ids + one different clip
    val mk = (id: Long, seed: Long) => {
      val frames = (0 until 3).map { f =>
        Multimodal.Decoded(8, 8, Array.tabulate(64)(i =>
          Multimodal.synthVideoPixel(seed, f, i % 8, i / 8)))
      }
      val avi = Multimodal.AviCodec.encode(frames, 8)
      (id, "video", avi, avi.length.toLong)
    }
    val media = Seq(mk(1L, 7L), mk(2L, 7L), mk(3L, 8L))
      .toDF("id", "modality", "payload", "byte_len")
    val hashes = Multimodal.imagePhash(spark, media).collect().map(r => r.id -> r.phash).toMap
    assert(hashes(1L) == hashes(2L), "identical videos share the first-frame dHash")
    assert(hashes.size == 3)
  }

  test("simhashCrossPairs refuses identically-named id columns") {
    import spark.implicits._
    val f = Seq((1L, 2L)).toDF("id", "simhash")
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.simhashCrossPairs(f, "id", f, "id")
    }
  }

  test("audio fingerprint: exact-gain invariance, duplicate grouping, trailing-frame drop") {
    import spark.implicits._
    val ids = (0L until 9L).map(i => (i, i % 3)).toDF("doc_id", "pattern")
    val base = Multimodal.audioFingerprint(spark,
      Multimodal.synthesizeWavsKeyed(spark, ids, "doc_id", "pattern", gain10 = 10).toDF())
      .collect().map(r => r.id -> r.fingerprint).toMap
    val loud = Multimodal.audioFingerprint(spark,
      Multimodal.synthesizeWavsKeyed(spark, ids, "doc_id", "pattern", gain10 = 20).toDF())
      .collect().map(r => r.id -> r.fingerprint).toMap
    for (i <- 0L until 9L) {
      assert(base(i) == loud(i), s"doubling volume is EXACT integer scaling: contour preserved for $i")
      assert(base(i) == base(i % 3), "same pattern, same fingerprint")
      val n = Multimodal.synthNumSamples(i % 3)
      assert(base(i).length == n / 16 - 1, "one bit per adjacent full-frame pair")
    }
    assert(Set(0L, 1L, 2L).map(base).size == 3, "distinct signals fingerprint apart")
    // a clip whose length is NOT a multiple of the window drops the tail frame
    val odd = Multimodal.WavCodec.encode(Array.tabulate(40)(i => i + 1), 8000)
    val fp = Multimodal.audioFingerprint(spark,
      Seq((7L, "audio", odd, odd.length.toLong)).toDF("id", "modality", "payload", "byte_len"))
      .collect().head
    assert(fp.fingerprint.length == 1, "40 samples / window 16 = 2 full frames -> 1 bit")
    assert(fp.fingerprint == "1", "rising ramp: second frame carries more energy")
  }
}
