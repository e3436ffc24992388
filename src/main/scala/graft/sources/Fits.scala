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
 * E (float32), D (float64), nA (char strings).
 *
 * Scale shape: one FITS file = one task (the format has no internal
 * split points without an index — same constraint the reference
 * has); a catalog of many files parallelizes per file via
 * binaryFiles.
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
      val card = new String(bytes, i, 80, "US-ASCII")
      val key = card.take(8).trim
      if (key == "END") done = true
      else if (card.length > 10 && card(8) == '=') {
        val raw = card.substring(10).split("/")(0).trim
        val v = if (raw.startsWith("'")) raw.stripPrefix("'").split("'")(0).trim else raw
        cards(key) = v
      }
      i += 80
      if (!done && i >= bytes.length) throw new IllegalArgumentException("FITS: unterminated header")
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

  private def sparkType(c: Col): DataType = c.form match {
    case 'J' => IntegerType
    case 'K' => LongType
    case 'E' => FloatType
    case 'D' => DoubleType
    case 'A' => StringType
  }

  /** Decode one fixed-width record. */
  private def decodeRow(bytes: Array[Byte], rowStart: Int, cols: Seq[Col]): Row = {
    val bb = java.nio.ByteBuffer.wrap(bytes) // FITS is big-endian, the ByteBuffer default
    Row.fromSeq(cols.map { c =>
      val p = rowStart + c.offset
      c.form match {
        case 'J' => bb.getInt(p)
        case 'K' => bb.getLong(p)
        case 'E' => bb.getFloat(p)
        case 'D' => bb.getDouble(p)
        case 'A' => new String(bytes, p, c.repeat, "US-ASCII").trim
      }
    })
  }

  /** Parse a whole FITS file's first BINTABLE extension. */
  def parseFile(bytes: Array[Byte]): (StructType, Iterator[Row]) = {
    // primary HDU: header + (usually empty) data
    val (h0, afterPrimary) = readHeader(bytes, 0)
    val primaryData = {
      val bitpix = math.abs(h0.getOrElse("BITPIX", "8").toInt) / 8
      val naxis = h0.getOrElse("NAXIS", "0").toInt
      val n = (1 to naxis).map(i => h0.getOrElse(s"NAXIS$i", "0").toLong).product
      if (naxis == 0 || n == 0) 0L else ((bitpix * n + BLOCK - 1) / BLOCK) * BLOCK
    }
    val (h1, dataStart) = readHeader(bytes, afterPrimary + primaryData.toInt)
    require(h1.get("XTENSION").exists(_.startsWith("BINTABLE")),
      s"FITS: expected BINTABLE extension, got ${h1.get("XTENSION")}")
    val rowBytes = h1("NAXIS1").toInt
    val nRows = h1("NAXIS2").toInt
    val cols = columns(h1)
    val schema = StructType(cols.map(c => StructField(c.name, sparkType(c))))
    val rows = (0 until nRows).iterator.map(r => decodeRow(bytes, dataStart + r * rowBytes, cols))
    (schema, rows)
  }

  /** Distributed read: one task per FITS file. */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val sc = spark.sparkContext
    val files = sc.binaryFiles(paths.mkString(","))
    // schema from the first file (driver-side header peek)
    val firstBytes = files.first()._2.toArray()
    val (schema, _) = parseFile(firstBytes)
    val rows = files.flatMap { case (_, pds) => parseFile(pds.toArray())._2 }
    spark.createDataFrame(rows, schema)
  }
}
