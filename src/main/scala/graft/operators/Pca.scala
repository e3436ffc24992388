package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed PCA over an embedding column — the dimensionality-
 * reduction / whitening stage of an embedding pipeline (e.g. cheaper
 * semantic dedup or ANN in a projected space). lsd2 has no PCA; part
 * of the training-data surface this engine adds.
 *
 * Scale shape: ONE pass over the corpus accumulates (n, sum x,
 * upper-triangular sum x x^T) per partition — d + d(d+1)/2 doubles
 * of state, merged associatively (treeAggregate), nothing
 * corpus-sized is shuffled or collected. The d x d covariance
 * eigenproblem is solved on the DRIVER with a cyclic Jacobi sweep
 * (deterministic: fixed sweep order, fixed convergence threshold) —
 * the same driver-state contract as the k-means codebook (d = a few
 * hundred at most; the corpus can be 100 TB). Projection is a
 * map-only pass with the components inlined as literals.
 *
 * Eigenvectors are sign-canonicalized (the largest-|coordinate|
 * entry is made positive, first index winning ties) so the model is
 * reproducible run to run. Per-partition double sums make the last
 * ulp of the covariance partitioning-dependent, so PCA is
 * property-tested (eigen residuals, orthonormality, local-reference
 * parity) rather than hash-matched against a SQL oracle.
 */
object Pca {

  /** mean/components are row vectors of length d; components are the
   *  top-m eigenvectors of the covariance, eigenvalue-descending;
   *  `trace` is the FULL covariance trace (total variance across all
   *  d dims — not just the m retained), so
   *  explainedE6 = floor(1e6 * lambda_j / trace) honestly reports
   *  how much variance the kept components capture: fitting m=8 on
   *  isotropic 64-dim noise reports ~125000, not ~1e6. */
  final case class PcaModel(n: Long, mean: Array[Double],
                            eigenvalues: Array[Double],
                            components: Array[Array[Double]],
                            trace: Double) {
    def dim: Int = mean.length
    def explainedE6: Array[Long] = {
      if (trace <= 0) eigenvalues.map(_ => 0L)
      else eigenvalues.map(l => math.floor(l / trace * 1e6).toLong)
    }
  }

  /**
   * Fit on `vecCol` (array<float> or array<double>): single
   * treeAggregate pass for the first two moments, driver-side Jacobi
   * for the spectrum. `m` = number of components kept (1..d).
   */
  def fit(df: DataFrame, vecCol: String, m: Int): PcaModel = {
    val d = df.select(col(vecCol)).filter(col(vecCol).isNotNull)
      .limit(1).collect().headOption
      .map(_.getSeq[Any](0).length)
      .getOrElse(throw new IllegalArgumentException(
        "Pca.fit: no non-null vectors to fit on"))
    require(m >= 1 && m <= d, s"Pca.fit: m must be in [1, $d], got $m")
    val tri = d * (d + 1) / 2
    // (count, sum_x[d], sum_xxT upper triangle[tri])
    val zero = (0L, new Array[Double](d), new Array[Double](tri))
    val (n, s, ss) = df.select(col(vecCol).cast("array<double>"))
      .filter(col(vecCol).isNotNull)
      .rdd.map(_.getSeq[Double](0).toArray)
      .treeAggregate(zero)(
        seqOp = { case ((c, sv, st), x) =>
          require(x.length == d,
            s"Pca.fit: ragged vectors (${x.length} vs $d) — fix the embedding column first")
          var i = 0
          var k = 0
          while (i < d) {
            sv(i) += x(i)
            var j = i
            while (j < d) { st(k) += x(i) * x(j); j += 1; k += 1 }
            i += 1
          }
          (c + 1, sv, st)
        },
        combOp = { case ((c1, s1, t1), (c2, s2, t2)) =>
          var i = 0
          while (i < d) { s1(i) += s2(i); i += 1 }
          var k = 0
          while (k < tri) { t1(k) += t2(k); k += 1 }
          (c1 + c2, s1, t1)
        })
    require(n >= 2, s"Pca.fit: need at least 2 vectors, got $n")
    val mean = s.map(_ / n)
    // cov = E[xx^T] - mu mu^T (population covariance, 1/n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    var k = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = ss(k) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; k += 1
      }
      i += 1
    }
    val (vals, vecs) = jacobiEigen(cov)
    // sort eigenpairs descending; canonicalize sign
    val order = vals.indices.sortBy(j => (-vals(j), j))
    val topVals = order.take(m).map(vals(_)).toArray
    val topVecs = order.take(m).map { j =>
      val v = Array.tabulate(d)(r => vecs(r)(j))
      val pivot = v.indices.maxBy(r => (math.abs(v(r)), -r))
      if (v(pivot) < 0) v.map(-_) else v
    }.toArray
    PcaModel(n, mean, topVals, topVecs, (0 until d).map(i => cov(i)(i)).sum)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
   *  (eigenvalues, eigenvector matrix with eigenvectors as COLUMNS).
   *  Deterministic: fixed (p,q) sweep order, fixed threshold. */
  private[graft] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val maxSweeps = 64
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > 1e-12) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > 1e-14) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1))
              case sgn => sgn / (math.abs(theta) + math.sqrt(theta * theta + 1))
            }
            val c = 1.0 / math.sqrt(t * t + 1)
            val sN = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - sN * aiq
              a(i)(q) = sN * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - sN * aqi
              a(q)(i) = sN * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - sN * viq
              v(i)(q) = sN * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /**
   * Johnson-Lindenstrauss random projection — the data-INDEPENDENT
   * sibling of [[fit]]/[[transform]]: a fixed +-1/sqrt(m) sign
   * matrix (Achlioptas 2003) preserves pairwise L2 distances within
   * (1 +- eps) w.h.p. at m = O(log n / eps^2), with NO fitting pass
   * — it works on a stream, before any data exists, and never needs
   * refreshing as the corpus grows (PCA needs all three). Entries
   * are dyadic and derived from a Knuth hash of (seed, row, col) —
   * the [[Ann]] hyperplane determinism recipe — so the projection is
   * reproducible everywhere with no stored model. Map-only, one
   * aggregate(zip_with) fold per output dim.
   */
  def randomProjection(df: DataFrame, vecCol: String, dim: Int, m: Int,
                       seed: Long = 42L): DataFrame = {
    require(m >= 1 && dim >= 1, s"randomProjection: need m, dim >= 1 (got $m, $dim)")
    val scale = 1.0 / math.sqrt(m.toDouble)
    // splitmix64 finalizer: a single multiplicative round leaves
    // consecutive (j, i) cells CORRELATED in any fixed bit (measured
    // distortion envelope [0.04, 4.8] vs the expected ~[0.5, 2] at
    // m=32) — full avalanche restores the independent-sign model
    def sign(j: Int, i: Int): Double = {
      var z = seed * 0x9e3779b97f4a7c15L + (j.toLong * dim + i) + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^= (z >>> 31)
      if ((z & 1L) == 0L) scale else -scale
    }
    val xs = col(vecCol).cast("array<double>")
    val projs: Seq[Column] = (0 until m).map { j =>
      val rowLit = array((0 until dim).map(i => lit(sign(j, i))): _*)
      aggregate(zip_with(xs, rowLit, (x, w) => x * w), lit(0.0), (acc, y) => acc + y)
    }
    df.withColumn("rproj", array(projs: _*))
  }

  /** Map-only projection onto the model's components: one
   *  `aggregate(zip_with(...))` fold per component with the centered
   *  component literals inlined (x . v - mu . v), no UDF. Output:
   *  input columns + `proj` (array<double>, length m). */
  def transform(df: DataFrame, vecCol: String, model: PcaModel): DataFrame = {
    val xs = col(vecCol).cast("array<double>")
    val projs: Seq[Column] = model.components.map { comp =>
      val vLit = array(comp.map(lit): _*)
      val muDotV = comp.zip(model.mean).map { case (vj, mj) => vj * mj }.sum
      aggregate(zip_with(xs, vLit, (x, w) => x * w), lit(0.0), (acc, y) => acc + y) - lit(muDotV)
    }
    df.withColumn("proj", array(projs: _*))
  }
}
