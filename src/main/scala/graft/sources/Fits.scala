package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Minimal FITS binary-table (BINTABLE) reader — the reference's
 * fourth ingest format (hipscat/partitioner.py:57, read via
 * astropy Table in dask_utils.py:44).
 *
 * Implements the public FITS 4.0 standard subset that astronomical
 * catalogs actually use: primary HDU skipped, first BINTABLE
 * extension parsed from its 80-char header cards (NAXIS1 row bytes,
 * NAXIS2 rows, TFIELDS/TTYPEn/TFORMn), fixed-width big-endian
 * records decoded per row. Supported TFORMs: J (int32), K (int64),
 * E (float32), D (float64), nA (char strings); numeric repeats > 1
 * (e.g. '3E') decode as array columns.
 *
 * Scale shape: one FITS file = one task (the format has no internal
 * split points without an index — same constraint the reference
 * has); a catalog of many files parallelizes per file via
 * binaryFiles. Schema comes from a header-blocks-only peek of the
 * first file; every file's schema is validated against it.
 */
object Fits {

  final case class Col(name: String, form: Char, repeat: Int, offset: Int, len: Int)

  private val BLOCK = 2880

  /** Parse 80-char header cards from `bytes` starting at `off` until END; returns (map, nextOffset). */
  private def readHeader(bytes: Array[Byte], off: Int): (Map[String, String], Int) = {
    val cards = scala.collection.mutable.Map.empty[String, String]
    var i = off
    var done = false
    while (!done) {
      if (i + 80 > bytes.length)
        throw new IllegalArgumentException(s"FITS: truncated header (offset $i of ${bytes.length} bytes)")
      val card = new String(bytes, i, 80, "US-ASCII")
      val key = card.take(8).trim
      if (key == "END") done = true
      else if (card.length > 10 && card(8) == '=') {
        val raw = card.substring(10)
        // quoted strings may contain '/', the comment delimiter only
        // applies outside them; a literal quote is escaped as ''
        // (FITS 4.0 §4.1.2.3) — scan to the first UNdoubled quote
        val v =
          if (raw.trim.startsWith("'")) {
            val t = raw.trim.stripPrefix("'")
            val sb = new StringBuilder
            var j = 0
            var closed = false
            while (j < t.length && !closed) {
              if (t(j) == '\'') {
                if (j + 1 < t.length && t(j + 1) == '\'') { sb += '\''; j += 2 }
                else closed = true
              } else { sb += t(j); j += 1 }
            }
            sb.result().trim
          } else raw.split("/")(0).trim
        cards(key) = v
      }
      i += 80
    }
    // headers occupy whole 2880-byte blocks
    val next = ((i + BLOCK - 1) / BLOCK) * BLOCK
    (cards.toMap, next)
  }

  /** Columns (with byte offsets) from a BINTABLE header. */
  private def columns(h: Map[String, String]): Seq[Col] = {
    val tfields = h("TFIELDS").toInt
    var offset = 0
    (1 to tfields).map { i =>
      val form = h(s"TFORM$i").trim
      val (repeat, code) = {
        val digits = form.takeWhile(_.isDigit)
        (if (digits.isEmpty) 1 else digits.toInt, form.dropWhile(_.isDigit).head)
      }
      val width = code match {
        case 'J' => 4; case 'K' => 8; case 'E' => 4; case 'D' => 8; case 'A' => 1
        case other => throw new UnsupportedOperationException(s"FITS TFORM '$other' not supported (J K E D A)")
      }
      val c = Col(h.getOrElse(s"TTYPE$i", s"col$i").trim, code, repeat, offset, repeat * width)
      offset += c.len
      c
    }
  }

  private def sparkType(c: Col): DataType = {
    val scalar: DataType = c.form match {
      case 'J' => IntegerType
      case 'K' => LongType
      case 'E' => FloatType
      case 'D' => DoubleType
      case 'A' => StringType
    }
    if (c.form != 'A' && c.repeat > 1) ArrayType(scalar, containsNull = false) else scalar
  }

  /** Decode one fixed-width record (numeric repeats > 1 become arrays). */
  private def decodeRow(bytes: Array[Byte], rowStart: Int, cols: Seq[Col]): Row = {
    val bb = java.nio.ByteBuffer.wrap(bytes) // FITS is big-endian, the ByteBuffer default
    Row.fromSeq(cols.map { c =>
      val p = rowStart + c.offset
      def one(i: Int): Any = c.form match {
        case 'J' => bb.getInt(p + 4 * i)
        case 'K' => bb.getLong(p + 8 * i)
        case 'E' => bb.getFloat(p + 4 * i)
        case 'D' => bb.getDouble(p + 8 * i)
      }
      c.form match {
        case 'A' => new String(bytes, p, c.repeat, "US-ASCII").trim
        case _ if c.repeat > 1 => (0 until c.repeat).map(one)
        case _ => one(0)
      }
    })
  }

  /** Both headers (primary + first BINTABLE); returns (bintableHeader, dataStart). */
  private def headers(bytes: Array[Byte]): (Map[String, String], Int) = {
    val (h0, afterPrimary) = readHeader(bytes, 0)
    val primaryData = {
      val bitpix = math.abs(h0.getOrElse("BITPIX", "8").toInt) / 8
      val naxis = h0.getOrElse("NAXIS", "0").toInt
      val n = (1 to naxis).map(i => h0.getOrElse(s"NAXIS$i", "0").toLong).product
      if (naxis == 0 || n == 0) 0L else ((bitpix * n + BLOCK - 1) / BLOCK) * BLOCK
    }
    // this reader holds one file in a byte array, so HDU offsets are
    // capped at 2 GiB — fail loudly rather than wrap a Long.toInt
    // (a >2 GiB primary HDU would otherwise seek to garbage)
    val bintableOff = afterPrimary.toLong + primaryData
    require(bintableOff <= Int.MaxValue,
      s"FITS: primary HDU too large for the in-memory reader (BINTABLE at byte $bintableOff > 2 GiB)")
    val (h1, dataStart) = readHeader(bytes, bintableOff.toInt)
    require(h1.get("XTENSION").exists(_.startsWith("BINTABLE")),
      s"FITS: expected BINTABLE extension, got ${h1.get("XTENSION")}")
    (h1, dataStart)
  }

  /** Parse a whole FITS file's first BINTABLE extension. */
  def parseFile(bytes: Array[Byte]): (StructType, Iterator[Row]) = {
    val (h1, dataStart) = headers(bytes)
    val rowBytes = h1("NAXIS1").toInt
    val nRows = h1("NAXIS2").toInt
    val cols = columns(h1)
    val schema = StructType(cols.map(c => StructField(c.name, sparkType(c))))
    val rows = (0 until nRows).iterator.map(r => decodeRow(bytes, dataStart + r * rowBytes, cols))
    (schema, rows)
  }

  /** Schema from header blocks only (no full-file read). */
  def peekSchema(spark: SparkSession, path: String): StructType = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fileLen = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      // catalogs have an empty primary HDU; 64 blocks (180 KB) cover
      // any realistic pair of headers — grow once on demand
      var take = math.min(fileLen, 64L * BLOCK).toInt
      var bytes = new Array[Byte](take)
      in.readFully(0, bytes)
      try {
        val (h1, _) = headers(bytes)
        StructType(columns(h1).map(c => StructField(c.name, sparkType(c))))
      } catch {
        case _: IllegalArgumentException if take < fileLen =>
          require(fileLen <= Int.MaxValue,
            s"FITS: file too large for the in-memory reader ($fileLen bytes > 2 GiB)")
          take = fileLen.toInt
          bytes = new Array[Byte](take)
          in.readFully(0, bytes)
          val (h1, _) = headers(bytes)
          StructType(columns(h1).map(c => StructField(c.name, sparkType(c))))
      }
    } finally in.close()
  }

  private def padCard(s: String): String = s.padTo(80, ' ')
  private def numCard(key: String, v: Long): String =
    padCard(key.padTo(8, ' ') + "= " + v.toString.reverse.padTo(20, ' ').reverse)
  private def strCard(key: String, v: String): String =
    padCard(key.padTo(8, ' ') + "= '" + v + "'")
  private def logCard(key: String, v: Boolean): String =
    padCard(key.padTo(8, ' ') + "= " + (" " * 19) + (if (v) "T" else "F"))
  private def headerBlock(cards: Seq[String]): Array[Byte] = {
    val s = cards.mkString + padCard("END")
    val padded = s + " " * ((BLOCK - s.length % BLOCK) % BLOCK)
    padded.getBytes("US-ASCII")
  }

  /**
   * Write a full-sky IMPLICIT-indexed Healpix counts map as a FITS
   * BINTABLE — the reference's `{cat}_order{K}_hpmap.fits` artifact
   * (written by hp.write_map at partitioner.py:129, read back at
   * lsd2_io.py:163), so a healpy-ecosystem user can `hp.read_map`
   * graft's density map. Layout follows the healpy convention: empty
   * primary HDU; one BINTABLE with a single int64 column chunked
   * 1024-per-row (TFORM '1024K'), PIXTYPE=HEALPIX, INDXSCHM=IMPLICIT,
   * OBJECT=FULLSKY. One deliberate divergence: the reference's data
   * is NEST-indexed but hp.write_map's default labels it RING —
   * graft labels truthfully (ORDERING=NESTED). Missing pixels are 0
   * (a counts map, not a sky temperature — no UNSEEN sentinel).
   * Bounded: order <= 10 keeps the dense array at <= 12.6M longs
   * (100 MB); the sparse map is downsampled in Spark BEFORE this
   * driver-side densify (Catalog.exportFitsMap).
   */
  def writeHealpixMap(spark: SparkSession, path: String, order: Int,
                      pix: Array[Long], cnt: Array[Long],
                      ordering: String = "NESTED"): Unit = {
    require(order >= 0 && order <= 10,
      s"writeHealpixMap: order must be in [0, 10] — the dense IMPLICIT layout is " +
        s"12*4^order entries (order 10 = 12.6M = 100 MB); downsample first (got $order)")
    require(pix.length == cnt.length, s"pix/cnt length mismatch: ${pix.length} != ${cnt.length}")
    require(ordering == "NESTED" || ordering == "RING",
      s"writeHealpixMap: ordering must be NESTED or RING (got $ordering)")
    // healpy's read_map DEFAULTS to RING: a plain hp.read_map(path) on
    // a NESTED map silently scrambles pixels unless the user remembers
    // nest=True. RING lays the same counts out at their RING indices
    // (input pixel ids stay NEST — the import pipeline's scheme).
    val ring = ordering == "RING"
    val npix = 12L << (2 * order)
    val dense = new Array[Long](npix.toInt)
    var i = 0
    while (i < pix.length) {
      require(pix(i) >= 0 && pix(i) < npix, s"pixel ${pix(i)} out of range for order $order")
      val at = if (ring) graft.healpix.Healpix.nest2ring(order, pix(i)) else pix(i)
      dense(at.toInt) += cnt(i)
      i += 1
    }
    val repeat = if (npix % 1024 == 0) 1024 else npix.toInt
    val nRows = (npix / repeat).toInt
    val primary = headerBlock(Seq(
      logCard("SIMPLE", v = true), numCard("BITPIX", 8),
      numCard("NAXIS", 0), logCard("EXTEND", v = true)))
    val bintable = headerBlock(Seq(
      strCard("XTENSION", "BINTABLE"), numCard("BITPIX", 8),
      numCard("NAXIS", 2), numCard("NAXIS1", repeat * 8L), numCard("NAXIS2", nRows),
      numCard("PCOUNT", 0), numCard("GCOUNT", 1), numCard("TFIELDS", 1),
      strCard("TTYPE1", "TEMPERATURE"), strCard("TFORM1", s"${repeat}K"),
      strCard("PIXTYPE", "HEALPIX"), strCard("ORDERING", ordering),
      strCard("COORDSYS", "C"), strCard("EXTNAME", "xtension"),
      numCard("NSIDE", 1L << order), numCard("FIRSTPIX", 0), numCard("LASTPIX", npix - 1),
      strCard("INDXSCHM", "IMPLICIT"), strCard("OBJECT", "FULLSKY")))
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(p, true), 1 << 20))
    try {
      out.write(primary); out.write(bintable)
      dense.foreach(out.writeLong) // DataOutputStream is big-endian, the FITS byte order
      val dataBytes = npix * 8
      val pad = ((dataBytes + BLOCK - 1) / BLOCK * BLOCK - dataBytes).toInt
      out.write(new Array[Byte](pad))
    } finally out.close()
  }

  /**
   * Write a normalized MOC in the IVOA MOC 2.0 FITS serialization
   * (MOC 2.0 §4.3 — the footprint artifact VO services exchange and
   * mocpy/Aladin read): a BINTABLE with ONE int64 column `UNIQ` of
   * ascending NUNIQ tile ids, headers PIXTYPE=HEALPIX /
   * ORDERING=NUNIQ / COORDSYS=C / MOCORDER=<max order> / MOCVERS=2.0.
   * Input is [[graft.operators.Spatial.mocNormalize]] (or the set
   * ops') `nuniq` column collected ascending — MOCs are npix-bounded
   * artifacts, so the driver-side array is the serialization's own
   * size. Round-trips through [[read]].
   */
  def writeMoc(spark: SparkSession, path: String, nuniq: Array[Long], mocOrder: Int): Unit = {
    require(mocOrder >= 0 && mocOrder <= 29, s"writeMoc: mocOrder in [0, 29], got $mocOrder")
    require(nuniq.sameElements(nuniq.sorted),
      "writeMoc: NUNIQ ids must be ascending (the MOC serialization order)")
    nuniq.headOption.foreach(h => require(h >= 4L,
      s"writeMoc: $h is not a valid NUNIQ id (norder 0 starts at 4)"))
    val primary = headerBlock(Seq(
      logCard("SIMPLE", v = true), numCard("BITPIX", 8),
      numCard("NAXIS", 0), logCard("EXTEND", v = true)))
    val bintable = headerBlock(Seq(
      strCard("XTENSION", "BINTABLE"), numCard("BITPIX", 8),
      numCard("NAXIS", 2), numCard("NAXIS1", 8), numCard("NAXIS2", nuniq.length),
      numCard("PCOUNT", 0), numCard("GCOUNT", 1), numCard("TFIELDS", 1),
      strCard("TTYPE1", "UNIQ"), strCard("TFORM1", "1K"),
      strCard("PIXTYPE", "HEALPIX"), strCard("ORDERING", "NUNIQ"),
      strCard("COORDSYS", "C"), numCard("MOCORDER", mocOrder),
      strCard("MOCVERS", "2.0"), strCard("MOCTOOL", "graft")))
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(p, true), 1 << 20))
    try {
      out.write(primary); out.write(bintable)
      nuniq.foreach(out.writeLong)
      val dataBytes = nuniq.length.toLong * 8
      val pad = ((dataBytes + BLOCK - 1) / BLOCK * BLOCK - dataBytes).toInt
      out.write(new Array[Byte](pad))
    } finally out.close()
  }

  /** Distributed read: one task per FITS file; all files must share the first file's schema. */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val sc = spark.sparkContext
    // binaryFiles (Hadoop setInputPaths) treats ',' as a path list
    // separator at every level, so a path CONTAINING a comma would be
    // silently split into two bogus paths — fail loudly instead
    paths.find(_.contains(",")).foreach(p => throw new IllegalArgumentException(
      s"FITS path contains a comma, which the Hadoop path-list API cannot represent: $p — rename the file"))
    val schema = peekSchema(spark, paths.head)
    val rows = sc.binaryFiles(paths.mkString(",")).flatMap { case (name, pds) =>
      val (s, it) = parseFile(pds.toArray())
      require(s == schema, s"FITS schema mismatch in $name: $s != $schema")
      it
    }
    spark.createDataFrame(rows, schema)
  }
}
