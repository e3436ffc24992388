package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions._

/**
 * Spherical-geometry column functions, composed from built-in
 * (codegen'd) Spark functions — no UDFs on the hot path.
 *
 * Mirrors the reference's numerics:
 *  - gcDist    = hipscat/util.py:211 (gc_dist, haversine in degrees)
 *  - gnomonicX/Y = hipscat/util.py:197 + :353 (gnomonic projection)
 *  - hpix      = healpy ang2pix NEST (util.py:24) via HpixExpr
 *  - hpixCover = healpy query_disc-style conservative cover
 */
object sphere {

  /** HEALPix NEST pixel of (ra, dec) at `order`. */
  def hpix(ra: Column, dec: Column, order: Int): Column =
    GraftBridge.column(HpixExpr(
      GraftBridge.expression(ra.cast("double")), GraftBridge.expression(dec.cast("double")),
      GraftBridge.expression(lit(order))))

  /** Conservative pixel cover of the disc (ra, dec, radiusDeg) at `order`. */
  def hpixCover(ra: Column, dec: Column, order: Int, radiusDeg: Column): Column =
    GraftBridge.column(HpixCoverExpr(
      GraftBridge.expression(ra.cast("double")), GraftBridge.expression(dec.cast("double")),
      GraftBridge.expression(lit(order)), GraftBridge.expression(radiusDeg.cast("double"))))

  /** The 8-connected NEST neighborhood (healpy get_all_neighbours
   *  parity; 7 entries at three-valent face corners), sorted. */
  def hpixNeighbors(pix: Column, order: Int): Column =
    GraftBridge.column(HpixNeighborsExpr(
      GraftBridge.expression(pix.cast("long")), GraftBridge.expression(lit(order))))

  /** Pixel-center ra/dec in degrees (healpy pix2ang parity — the
   *  inverse of [[hpix]]; map-space geometry from a pixel id). */
  def hpixCenterRa(pix: Column, order: Int): Column =
    GraftBridge.column(HpixCenterRaExpr(
      GraftBridge.expression(pix.cast("long")), GraftBridge.expression(lit(order))))
  def hpixCenterDec(pix: Column, order: Int): Column =
    GraftBridge.column(HpixCenterDecExpr(
      GraftBridge.expression(pix.cast("long")), GraftBridge.expression(lit(order))))

  /**
   * Great-circle distance in degrees (haversine) — native codegen
   * expression (GcDistExpr); its kernel mirrors the DuckDB oracle
   * SQL's operation order so both engines agree to the last ulp,
   * and the optimizer rule graft.plans.SpatialFilterPushdown can
   * pattern-match it to derive scan-pushable bounding predicates.
   */
  def gcDist(ra1: Column, dec1: Column, ra2: Column, dec2: Column): Column =
    GraftBridge.column(GcDistExpr(
      GraftBridge.expression(ra1.cast("double")), GraftBridge.expression(dec1.cast("double")),
      GraftBridge.expression(ra2.cast("double")), GraftBridge.expression(dec2.cast("double"))))

  /** SQL text of gcDist for DuckDB oracles (same formula, same order of ops). */
  def gcDistSql(ra1: String, dec1: String, ra2: String, dec2: String): String =
    s"2.0 * degrees(asin(least(1.0, sqrt(" +
      s"pow(sin(radians($dec1 - $dec2) / 2), 2) + " +
      s"cos(radians($dec1)) * cos(radians($dec2)) * pow(sin(radians($ra1 - $ra2) / 2), 2)))))"

  private def cosc(lon: Column, lat: Column, clon: Double, clat: Double): Column =
    lit(math.sin(math.toRadians(clat))) * sin(radians(lat)) +
      lit(math.cos(math.toRadians(clat))) * cos(radians(lat)) * cos(radians(lon) - lit(math.toRadians(clon)))

  /** Gnomonic x (degrees) of (lon, lat) about center (clon, clat). */
  def gnomonicX(lon: Column, lat: Column, clon: Double, clat: Double): Column =
    degrees(cos(radians(lat)) * sin(radians(lon) - lit(math.toRadians(clon))) / cosc(lon, lat, clon, clat))

  /** Gnomonic y (degrees) of (lon, lat) about center (clon, clat). */
  def gnomonicY(lon: Column, lat: Column, clon: Double, clat: Double): Column =
    degrees((lit(math.cos(math.toRadians(clat))) * sin(radians(lat)) -
      lit(math.sin(math.toRadians(clat))) * cos(radians(lat)) * cos(radians(lon) - lit(math.toRadians(clon)))) /
      cosc(lon, lat, clon, clat))

  /** SQL text of gnomonic x/y for DuckDB oracles. */
  def gnomonicXSql(lon: String, lat: String, clon: Double, clat: Double): String = {
    val (sc, cc, l0) = (math.sin(math.toRadians(clat)), math.cos(math.toRadians(clat)), math.toRadians(clon))
    s"degrees(cos(radians($lat)) * sin(radians($lon) - $l0) / " +
      s"($sc * sin(radians($lat)) + $cc * cos(radians($lat)) * cos(radians($lon) - $l0)))"
  }
  def gnomonicYSql(lon: String, lat: String, clon: Double, clat: Double): String = {
    val (sc, cc, l0) = (math.sin(math.toRadians(clat)), math.cos(math.toRadians(clat)), math.toRadians(clon))
    s"degrees(($cc * sin(radians($lat)) - $sc * cos(radians($lat)) * cos(radians($lon) - $l0)) / " +
      s"($sc * sin(radians($lat)) + $cc * cos(radians($lat)) * cos(radians($lon) - $l0)))"
  }

  // IAU J2000 galactic frame constants: pole (AG, DG), node longitude LNCP
  private val AG = 192.85948
  private val DG = 27.12825
  private val LNCP = 122.93192

  /** Galactic latitude b (degrees) of equatorial J2000 (ra, dec). */
  def galacticB(ra: Column, dec: Column): Column =
    degrees(asin(lit(math.sin(math.toRadians(DG))) * sin(radians(dec)) +
      lit(math.cos(math.toRadians(DG))) * cos(radians(dec)) *
        cos(radians(ra) - lit(math.toRadians(AG)))))

  /** Galactic longitude l (degrees, [0, 360)) of equatorial J2000 (ra, dec). */
  def galacticL(ra: Column, dec: Column): Column = {
    val y = cos(radians(dec)) * sin(radians(ra) - lit(math.toRadians(AG)))
    val x = lit(math.cos(math.toRadians(DG))) * sin(radians(dec)) -
      lit(math.sin(math.toRadians(DG))) * cos(radians(dec)) *
        cos(radians(ra) - lit(math.toRadians(AG)))
    val l = lit(LNCP) - degrees(atan2(y, x))
    (l % lit(360.0) + lit(360.0)) % lit(360.0)
  }

  /** SQL twins of galacticB/galacticL for DuckDB oracles — identical
   *  constant values (Double.toString round-trips exactly) and
   *  identical operation order. */
  def galacticBSql(ra: String, dec: String): String = {
    val (sd, cd, a0) = (math.sin(math.toRadians(DG)), math.cos(math.toRadians(DG)), math.toRadians(AG))
    s"degrees(asin($sd * sin(radians($dec)) + $cd * cos(radians($dec)) * cos(radians($ra) - $a0)))"
  }
  def galacticLSql(ra: String, dec: String): String = {
    val (sd, cd, a0) = (math.sin(math.toRadians(DG)), math.cos(math.toRadians(DG)), math.toRadians(AG))
    val y = s"cos(radians($dec)) * sin(radians($ra) - $a0)"
    val x = s"$cd * sin(radians($dec)) - $sd * cos(radians($dec)) * cos(radians($ra) - $a0)"
    s"(($LNCP - degrees(atan2($y, $x))) % 360.0 + 360.0) % 360.0"
  }

  /**
   * Deterministic pseudo sky coordinates derived from an integer key
   * (the TPC-H-ish test tables carry no ra/dec — see SURVEY.md §3).
   * Spark and the DuckDB oracle derive identical values.
   */
  def raOf(key: Column): Column = (key * 137 % 36000).cast("double") / 100.0
  def decOf(key: Column): Column = (key * 211 % 16000).cast("double") / 100.0 - 80.0
  def raOfSql(key: String): String = s"CAST($key * 137 % 36000 AS DOUBLE) / 100.0"
  def decOfSql(key: String): String = s"CAST($key * 211 % 16000 AS DOUBLE) / 100.0 - 80.0"
}
