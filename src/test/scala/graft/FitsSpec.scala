package graft

import graft.sources.{CatalogReader, Fits}
import graft.sources.CatalogReader.CatalogSpec
import graft.functions.sphere
import java.io.ByteArrayOutputStream

/**
 * Round-trip test against a FITS 4.0 BINTABLE built byte-by-byte to
 * the public standard (2880-byte header units of 80-char cards,
 * big-endian fixed records).
 */
class FitsSpec extends SparkSpecBase {

  private def card(key: String, value: String): Array[Byte] =
    (key.padTo(8, ' ') + "= " + value).padTo(80, ' ').getBytes("US-ASCII")
  private def endCard: Array[Byte] = "END".padTo(80, ' ').getBytes("US-ASCII")
  private def pad(out: ByteArrayOutputStream): Unit =
    while (out.size() % 2880 != 0) out.write(' ')
  private def padZero(out: ByteArrayOutputStream): Unit =
    while (out.size() % 2880 != 0) out.write(0)

  private def buildFits(rows: Seq[(Double, Double, Long, String)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    // primary HDU: minimal header, no data
    out.write(card("SIMPLE", "T"))
    out.write(card("BITPIX", "8"))
    out.write(card("NAXIS", "0"))
    out.write(endCard); pad(out)
    // BINTABLE extension header
    val rowBytes = 8 + 8 + 8 + 6
    out.write(card("XTENSION", "'BINTABLE'"))
    out.write(card("BITPIX", "8"))
    out.write(card("NAXIS", "2"))
    out.write(card("NAXIS1", rowBytes.toString))
    out.write(card("NAXIS2", rows.length.toString))
    out.write(card("PCOUNT", "0"))
    out.write(card("GCOUNT", "1"))
    out.write(card("TFIELDS", "4"))
    out.write(card("TTYPE1", "'RA      '")); out.write(card("TFORM1", "'D       '"))
    out.write(card("TTYPE2", "'DEC     '")); out.write(card("TFORM2", "'D       '"))
    out.write(card("TTYPE3", "'SRC_ID  '")); out.write(card("TFORM3", "'K       '"))
    out.write(card("TTYPE4", "'TAG     '")); out.write(card("TFORM4", "'6A      '"))
    out.write(endCard); pad(out)
    // data records, big-endian
    val bb = java.nio.ByteBuffer.allocate(rowBytes * rows.length)
    rows.foreach { case (ra, dec, id, tag) =>
      bb.putDouble(ra); bb.putDouble(dec); bb.putLong(id)
      bb.put(tag.padTo(6, ' ').getBytes("US-ASCII"), 0, 6)
    }
    out.write(bb.array()); padZero(out)
    out.toByteArray
  }

  private val sample = Seq(
    (10.5, -20.25, 7L, "alpha"),
    (180.0, 45.0, 9L, "beta"),
    (359.9, -89.5, 11L, "gamma"))

  test("parseFile decodes header, schema and big-endian records") {
    val (schema, rows) = Fits.parseFile(buildFits(sample))
    assert(schema.fieldNames.toSeq == Seq("RA", "DEC", "SRC_ID", "TAG"))
    val got = rows.toSeq.map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getString(3)))
    assert(got == sample)
  }

  test("fits ingest through CatalogReader with keyword renames") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fits")
    java.nio.file.Files.write(dir.resolve("cat.fits"), buildFits(sample))
    val df = CatalogReader.read(spark, Seq(dir.resolve("cat.fits").toString),
      CatalogSpec(fmt = "fits", raKw = "RA", decKw = "DEC", idKw = "SRC_ID"))
    val got = df.select("ra", "dec", "id", "TAG").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getString(3))).sortBy(_._3)
    assert(got.toSeq == sample.sortBy(_._3))
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("array TFORM (3E) decodes as an array column; quoted slash survives") {
    val out = new ByteArrayOutputStream()
    out.write(card("SIMPLE", "T")); out.write(card("BITPIX", "8")); out.write(card("NAXIS", "0"))
    out.write(endCard); pad(out)
    val rowBytes = 8 + 12
    out.write(card("XTENSION", "'BINTABLE'"))
    out.write(card("NAXIS", "2"))
    out.write(card("NAXIS1", rowBytes.toString)); out.write(card("NAXIS2", "2"))
    out.write(card("TFIELDS", "2"))
    out.write(card("TTYPE1", "'S/N     '")); out.write(card("TFORM1", "'K       '"))
    out.write(card("TTYPE2", "'FLUX    '")); out.write(card("TFORM2", "'3E      '"))
    out.write(endCard); pad(out)
    val bb = java.nio.ByteBuffer.allocate(rowBytes * 2)
    bb.putLong(1L); bb.putFloat(1.5f); bb.putFloat(2.5f); bb.putFloat(3.5f)
    bb.putLong(2L); bb.putFloat(4.0f); bb.putFloat(5.0f); bb.putFloat(6.0f)
    out.write(bb.array()); padZero(out)

    val (schema, rows) = Fits.parseFile(out.toByteArray)
    assert(schema.fieldNames.toSeq == Seq("S/N", "FLUX"))
    assert(schema("FLUX").dataType.typeName == "array")
    val got = rows.toSeq.map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(got == Seq((1L, Seq(1.5f, 2.5f, 3.5f)), (2L, Seq(4.0f, 5.0f, 6.0f))))
  }

  test("doubled-quote escape in string cards unescapes (FITS 4.0 4.1.2.3)") {
    // build a file whose TTYPE1 value contains an escaped quote and a
    // slash inside the string (comment delim must not apply inside)
    val out = new ByteArrayOutputStream()
    out.write(card("SIMPLE", "T")); out.write(card("BITPIX", "8")); out.write(card("NAXIS", "0"))
    out.write(endCard); pad(out)
    out.write(card("XTENSION", "'BINTABLE'"))
    out.write(card("BITPIX", "8")); out.write(card("NAXIS", "2"))
    out.write(card("NAXIS1", "8")); out.write(card("NAXIS2", "1"))
    out.write(card("PCOUNT", "0")); out.write(card("GCOUNT", "1"))
    out.write(card("TFIELDS", "1"))
    out.write(card("TTYPE1", "'it''s/ra'")); out.write(card("TFORM1", "'D       '"))
    out.write(endCard); pad(out)
    val bb = java.nio.ByteBuffer.allocate(8); bb.putDouble(1.5)
    out.write(bb.array()); padZero(out)
    val (schema, rows) = Fits.parseFile(out.toByteArray)
    assert(schema.fieldNames.toSeq == Seq("it's/ra"))
    assert(rows.next().getDouble(0) == 1.5)
  }

  test("comma in a FITS path is rejected loudly (Hadoop path-list limitation)") {
    val e = intercept[IllegalArgumentException] {
      Fits.read(spark, Seq("/tmp/bad,name.fits"))
    }
    assert(e.getMessage.contains("comma"))
  }

  test("truncated file fails with the clear truncation message") {
    val full = buildFits(sample)
    val e = intercept[IllegalArgumentException](Fits.parseFile(full.take(100)))
    assert(e.getMessage.contains("truncated"))
  }

  test("writeHealpixMap round-trip: healpy IMPLICIT layout, graft's own reader recovers the density map") {
    import org.apache.spark.sql.functions.{col, sum => ssum, shiftright}
    val out = java.nio.file.Files.createTempDirectory("graft_fitsmap").toString
    val cust = spark.read.parquet(sf("sf0.001") + "/customer.parquet")
      .withColumn("cra", sphere.raOf(col("c_custkey")))
      .withColumn("cdec", sphere.decOf(col("c_custkey")))
    val cat = catalog.Catalog.importFrom(cust, out, "fm", "cra", "cdec", "c_custkey",
      orderK = 2, threshold = 100, marginDeg = 12.0)

    val path = cat.exportFitsMap()
    assert(path.endsWith("fm_order2_hpmap.fits"), s"reference artifact naming: $path")
    val back = Fits.read(spark, Seq(path))
    // healpy IMPLICIT full-sky layout: one int64 vector column, every
    // pixel present (order 2 -> 192 pixels, one row of 192)
    assert(back.schema.fieldNames.toSeq == Seq("TEMPERATURE"))
    val dense = back.collect().flatMap(_.getSeq[Long](0))
    assert(dense.length == 192, s"full-sky IMPLICIT at order 2 is 192 pixels, got ${dense.length}")
    val sparse = cat.densityMap().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 192).foreach { p =>
      assert(dense(p) == sparse.getOrElse(p.toLong, 0L), s"pixel $p count mismatch")
    }
    assert(dense.sum == cust.count(), "map total must equal the imported row count")
    // header contract: the fields hp.read_map keys on
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val head = new String(bytes, "US-ASCII")
    Seq("PIXTYPE", "HEALPIX", "ORDERING", "NESTED", "INDXSCHM", "IMPLICIT", "NSIDE")
      .foreach(k => assert(head.contains(k), s"missing healpy header token $k"))

    // downsampled export: child-sum parity with the Spark-side rollup
    val p1 = cat.exportFitsMap(order = 1)
    val dense1 = Fits.read(spark, Seq(p1)).collect().flatMap(_.getSeq[Long](0))
    assert(dense1.length == 48)
    val roll = cat.densityMap()
      .groupBy(shiftright(col("pix"), 2).as("pix")).agg(ssum("cnt").as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 48).foreach(p => assert(dense1(p) == roll.getOrElse(p.toLong, 0L)))
    intercept[IllegalArgumentException](cat.exportFitsMap(order = 5)) // no upsampling

    // RING export: the healpy-DEFAULT layout — plain hp.read_map(path)
    // indexes by RING id, so every NEST pixel's count must sit at its
    // nest2ring slot and the header must say ORDERING=RING
    val pr = cat.exportFitsMap(ordering = "RING")
    assert(pr.endsWith("fm_order2_hpmap_ring.fits"), s"ring artifact naming: $pr")
    val denseR = Fits.read(spark, Seq(pr)).collect().flatMap(_.getSeq[Long](0))
    assert(denseR.length == 192)
    (0 until 192).foreach { p =>
      val at = graft.healpix.Healpix.nest2ring(2, p).toInt
      assert(denseR(at) == sparse.getOrElse(p.toLong, 0L),
        s"nest pixel $p must land at ring slot $at")
    }
    assert(denseR.sum == cust.count())
    val headR = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pr)), "US-ASCII")
    assert(headR.contains("RING") && !headR.contains("NESTED"),
      "RING export must label ORDERING= 'RING'")
  }

  test("writeMoc round-trip: IVOA MOC 2.0 NUNIQ serialization through graft's own reader") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_moc").toString
    // a mixed-order MOC from the engine's own normalizer: quad 0..3
    // merges to 0@o2, pixels 9 and 17 stay at o3
    val moc = graft.operators.Spatial
      .mocNormalize(Seq(0L, 1L, 2L, 3L, 9L, 17L).toDF("p"), "p", 3)
      .orderBy("nuniq").select("nuniq").collect().map(_.getLong(0))
    val path = s"$out/footprint.fits"
    Fits.writeMoc(spark, path, moc, mocOrder = 3)
    val back = Fits.read(spark, Seq(path))
    assert(back.schema.fieldNames.toSeq == Seq("UNIQ"))
    assert(back.orderBy(col("UNIQ")).collect().map(_.getLong(0)).toSeq == moc.toSeq)
    // header contract: the fields a MOC consumer (mocpy/Aladin) keys on
    val head = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "US-ASCII")
    Seq("PIXTYPE", "HEALPIX", "ORDERING", "NUNIQ", "MOCORDER", "MOCVERS", "UNIQ")
      .foreach(k => assert(head.contains(k), s"missing MOC header token $k"))
    // guards: unsorted input and sub-4 ids are not valid serializations
    intercept[IllegalArgumentException](Fits.writeMoc(spark, path, Array(20L, 16L), 1))
    intercept[IllegalArgumentException](Fits.writeMoc(spark, path, Array(1L), 1))
  }

  test("unsupported TFORM fails with a clear message") {
    // build a header with a complex-valued column (TFORM 'C')
    val out = new ByteArrayOutputStream()
    out.write(card("SIMPLE", "T")); out.write(card("BITPIX", "8")); out.write(card("NAXIS", "0"))
    out.write(endCard); pad(out)
    out.write(card("XTENSION", "'BINTABLE'")); out.write(card("NAXIS1", "8")); out.write(card("NAXIS2", "0"))
    out.write(card("TFIELDS", "1"))
    out.write(card("TTYPE1", "'X       '")); out.write(card("TFORM1", "'C       '"))
    out.write(endCard); pad(out)
    val e = intercept[UnsupportedOperationException](Fits.parseFile(out.toByteArray))
    assert(e.getMessage.contains("TFORM"))
  }
}
