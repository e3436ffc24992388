package graft

import graft.healpix.Healpix
import org.scalatest.funsuite.AnyFunSuite

/** neighborsNest against an INDEPENDENT adjacency derivation plus
  * structural invariants. Adjacency ground truth: two order-o pixels
  * share boundary iff some pair of their deep border-subcell centers
  * lies within ~2 deep-cell radii (non-touching pixels are separated
  * by at least one full order-o cell, so the test discriminates
  * cleanly). */
class NeighborsSpec extends AnyFunSuite {

  private def borderSamples(order: Int, pix: Long, sub: Int): Array[(Double, Double)] = {
    val m = 1L << sub
    val (ix, iy, f) = Healpix.nest2xyf(pix, order)
    val cells = (0L until m).flatMap(t => Seq((t, 0L), (t, m - 1), (0L, t), (m - 1, t))).distinct
    cells.map { case (sx, sy) =>
      Healpix.pix2angNest(order + sub, Healpix.xyf2nest(ix * m + sx, iy * m + sy, f, order + sub))
    }.toArray
  }

  private def bruteAdjacency(order: Int): Map[Long, Set[Long]] = {
    val sub = 5
    val thresh = 2.1 * math.toDegrees(Healpix.maxPixRad(order + sub))
    val pre = 3.0 * math.toDegrees(Healpix.maxPixRad(order))
    val n = Healpix.npix(order).toInt
    val centers = (0 until n).map(p => Healpix.pix2angNest(order, p.toLong))
    val borders = (0 until n).map(p => borderSamples(order, p.toLong, sub))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    for (p <- 0 until n; q <- (p + 1) until n) {
      val (ra1, d1) = centers(p); val (ra2, d2) = centers(q)
      if (Healpix.gcDistDeg(ra1, d1, ra2, d2) < pre) {
        val touch = borders(p).exists { case (a, b) =>
          borders(q).exists { case (c, d) => Healpix.gcDistDeg(a, b, c, d) < thresh } }
        if (touch) {
          adj(p.toLong) += q.toLong
          adj(q.toLong) += p.toLong
        }
      }
    }
    adj.toMap.withDefaultValue(Set.empty)
  }

  test("order-1 and order-2 neighbors equal the independent border-contact adjacency") {
    for (order <- Seq(1, 2)) {
      val want = bruteAdjacency(order)
      for (p <- 0L until Healpix.npix(order)) {
        val got = Healpix.neighborsNest(order, p).toSet
        assert(got == want(p), s"order $order pix $p: got $got want ${want(p)}")
      }
    }
  }

  test("structural invariants at order 3 and order 8") {
    for (order <- Seq(3, 8)) {
      val n = Healpix.npix(order)
      val sample = if (order <= 3) (0L until n)
                   else (0L until 600L).map(i => (i * 2654435761L) % n)
      var sevens = 0
      sample.foreach { p =>
        val nbrs = Healpix.neighborsNest(order, p)
        assert(nbrs.length == 7 || nbrs.length == 8, s"pix $p: ${nbrs.length} neighbors")
        if (nbrs.length == 7) sevens += 1
        assert(!nbrs.contains(p) && nbrs.distinct.length == nbrs.length)
        // mutuality: p appears in every neighbor's neighborhood
        nbrs.foreach { q =>
          assert(Healpix.neighborsNest(order, q).contains(p), s"$q !~ $p at order $order") }
        // geometric sanity: every neighbor's center within a few pixel radii
        val (ra, dec) = Healpix.pix2angNest(order, p)
        val bound = 4.0 * math.toDegrees(Healpix.maxPixRad(order))
        nbrs.foreach { q =>
          val (r2, d2) = Healpix.pix2angNest(order, q)
          assert(Healpix.gcDistDeg(ra, dec, r2, d2) < bound, s"far neighbor $q of $p") }
      }
      // exactly 24 seven-neighbor pixels exist per order (3 pixels at
      // each of the 8 three-valent face corners) — full enumeration
      // at order 3 must find them all
      if (order == 3) assert(sevens == 24, s"expected 24 seven-neighbor pixels, got $sevens")
    }
  }
}
