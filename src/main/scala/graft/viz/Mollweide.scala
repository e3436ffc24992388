package graft.viz

import java.awt.image.BufferedImage

import graft.healpix.Healpix

/**
 * Pure-JVM Mollweide renderings of HEALPix maps — the engine's answer
 * to the reference's notebook views (catalog.py:256-346
 * visualize_sources / visualize_partitions / visualize_cone_search,
 * healpy `hp.mollview` + matplotlib there). Everything here is
 * driver-side over the SPARSE collected map the catalog already
 * persists (point_map.parquet / the partition grid) — the same
 * memory contract as the reference, which reads the whole FITS map
 * into one ndarray before plotting. No plotting library: the
 * projection loop writes a `BufferedImage` and `javax.imageio`
 * encodes PNG, both in-JDK, so renders are byte-deterministic and
 * testable by decode-and-probe.
 *
 * Projection: equal-area Mollweide, RA 0h at the center meridian, RA
 * increasing LEFTWARD (the astronomical sky-view convention healpy
 * defaults to), Dec +90 up. Each image pixel inverse-projects to
 * (ra, dec) and samples the NEST map via [[Healpix.ang2pixNest]];
 * points outside the projection ellipse take the background color.
 */
object Mollweide {

  /** Inverse Mollweide: normalized ellipse coords (px in [-2,2],
   *  py in [-1,1]) -> (raDeg in [0,360), decDeg), or None outside
   *  the ellipse. */
  private[viz] def invert(px: Double, py: Double): Option[(Double, Double)] = {
    if (px * px / 4.0 + py * py > 1.0) None
    else {
      val theta = math.asin(py)
      val lat = math.asin((2.0 * theta + math.sin(2.0 * theta)) / math.Pi)
      val cosT = math.cos(theta)
      if (cosT < 1e-12) Some((0.0, math.toDegrees(lat))) // poles: ra arbitrary
      else {
        val lam = math.Pi * px / (2.0 * cosT) // in [-pi, pi]
        if (math.abs(lam) > math.Pi) None
        else {
          // astro convention: ra grows leftward; center meridian = ra 0
          val ra = (math.toDegrees(-lam) + 360.0) % 360.0
          Some((ra, math.toDegrees(lat)))
        }
      }
    }
  }

  /** Small perceptual ramp (dark violet -> teal -> yellow), t in [0,1]. */
  private[viz] def rampColor(t: Double): Int = {
    val anchors = Array((68, 1, 84), (59, 82, 139), (33, 145, 140), (94, 201, 98), (253, 231, 37))
    val x = math.max(0.0, math.min(1.0, t)) * (anchors.length - 1)
    val i = math.min(anchors.length - 2, x.toInt)
    val f = x - i
    val (r0, g0, b0) = anchors(i)
    val (r1, g1, b1) = anchors(i + 1)
    val r = (r0 + f * (r1 - r0)).round.toInt
    val g = (g0 + f * (g1 - g0)).round.toInt
    val b = (b0 + f * (b1 - b0)).round.toInt
    (0xff << 24) | (r << 16) | (g << 8) | b
  }

  private val background = 0xff202020 // outside the ellipse
  private val noData = 0xff3a3a3a     // inside the sky, no map value

  /**
   * Render an order-`order` NEST map to a `width` x `height` image.
   * `value(pix)` returns NaN for pixels with no data; non-NaN values
   * are scaled linearly from [vmin, vmax] into the color ramp.
   */
  def render(order: Int, value: Long => Double,
             width: Int = 800, height: Int = 400,
             vmin: Double = 0.0, vmax: Double = 1.0): BufferedImage = {
    require(order >= 0 && order <= 29, s"order out of range: $order")
    require(width > 1 && height > 1, s"degenerate image: ${width}x$height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_ARGB)
    val span = if (vmax > vmin) vmax - vmin else 1.0
    var yPix = 0
    while (yPix < height) {
      val py = 1.0 - 2.0 * (yPix + 0.5) / height // +1 top, -1 bottom
      var xPix = 0
      while (xPix < width) {
        val px = 4.0 * (xPix + 0.5) / width - 2.0 // -2 left, +2 right
        val argb = invert(px, py) match {
          case None => background
          case Some((ra, dec)) =>
            val v = value(Healpix.ang2pixNest(order, ra, dec))
            if (v.isNaN) noData else rampColor((v - vmin) / span)
        }
        img.setRGB(xPix, yPix, argb)
        xPix += 1
      }
      yPix += 1
    }
    img
  }

  /** The reference's visualize_sources: log10(count+1) density view
   *  from the sparse (pix, cnt) histogram the import persisted. */
  def sources(order: Int, pix: Array[Long], cnt: Array[Long],
              width: Int = 800, height: Int = 400): BufferedImage = {
    require(pix.length == cnt.length, "pix/cnt length mismatch")
    val m = new java.util.HashMap[java.lang.Long, java.lang.Double](pix.length * 2)
    var i = 0
    var vmax = 0.0
    while (i < pix.length) {
      val v = math.log10(cnt(i).toDouble + 1.0)
      m.put(pix(i), v)
      if (v > vmax) vmax = v
      i += 1
    }
    render(order, p => { val v = m.get(p); if (v == null) Double.NaN else v.doubleValue },
      width, height, 0.0, math.max(vmax, 1e-9))
  }

  /** The reference's visualize_partitions: each sky position colored
   *  by the ORDER of the partition pixel covering it; empty sky dark. */
  def partitions(pm: graft.catalog.HipsPartitioner.PartitionMap,
                 width: Int = 800, height: Int = 400): BufferedImage = {
    val occupied = pm.pixelsAtOrders.map { case (o, ps) => o -> ps.toSet }
    val maxOrder = pm.orderK.toDouble
    render(pm.orderK, { pixK =>
      val o = pm.assignedOrder(pixK)
      if (occupied.get(o).exists(_.contains(pm.partitionPixel(pixK)))) o.toDouble
      else Double.NaN
    }, width, height, 0.0, math.max(maxOrder, 1.0))
  }

  /** The reference's visualize_cone_search: the log-density view with
   *  the cone's pixel cover painted at full scale (the "pencil beam"). */
  def coneSearch(order: Int, pix: Array[Long], cnt: Array[Long],
                 raDeg: Double, decDeg: Double, radiusDeg: Double,
                 width: Int = 800, height: Int = 400): BufferedImage = {
    require(pix.length == cnt.length, "pix/cnt length mismatch")
    val m = new java.util.HashMap[java.lang.Long, java.lang.Double](pix.length * 2)
    var i = 0
    var vmax = 0.0
    while (i < pix.length) {
      val v = math.log10(cnt(i).toDouble + 1.0)
      m.put(pix(i), v)
      if (v > vmax) vmax = v
      i += 1
    }
    val beam = vmax + 1.0
    Healpix.queryDiscCover(order, raDeg, decDeg, radiusDeg).foreach(p => m.put(p, beam))
    render(order, p => { val v = m.get(p); if (v == null) Double.NaN else v.doubleValue },
      width, height, 0.0, beam)
  }

  /**
   * Log-density of cross-match results per right-catalog partition
   * tile — the reference's visualize_cross_match intent
   * (catalog.py:336 — "mollview of the overlap"; upstream it raises
   * NotImplementedError, so this completes the visualize_* family).
   * Tiles live at MIXED orders (the adaptive partition map), keyed
   * (k, pixAtK); each rendered order-`orderK` pixel looks its
   * ancestor up per represented order — at most a handful of probes
   * per pixel, no dense map materialized.
   */
  def crossMatch(orderK: Int, tileK: Array[Int], tilePix: Array[Long], cnt: Array[Long],
                 width: Int = 800, height: Int = 400): BufferedImage = {
    require(tileK.length == tilePix.length && tilePix.length == cnt.length,
      "tile arrays length mismatch")
    val m = new java.util.HashMap[java.lang.Long, java.lang.Double](tilePix.length * 2)
    var vmax = 0.0
    var i = 0
    while (i < tilePix.length) {
      val v = math.log10(cnt(i).toDouble + 1.0)
      m.put((tileK(i).toLong << 48) | tilePix(i), v)
      if (v > vmax) vmax = v
      i += 1
    }
    val orders = tileK.distinct.sorted
    render(orderK, { pixK =>
      var res = Double.NaN
      var j = 0
      while (j < orders.length && res.isNaN) {
        val o = orders(j)
        val v = m.get((o.toLong << 48) | (pixK >> (2 * (orderK - o))))
        if (v != null) res = v
        j += 1
      }
      res
    }, width, height, 0.0, math.max(vmax, 1e-9))
  }

  /** Deterministic PNG bytes (javax.imageio, in-JDK). */
  def pngBytes(img: BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Write a PNG next to the catalog (any Hadoop FileSystem path). */
  def writePng(spark: org.apache.spark.sql.SparkSession, img: BufferedImage, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(pngBytes(img)) finally out.close()
  }
}
