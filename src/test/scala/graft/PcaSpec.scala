package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpecBase {
  import spark.implicits._

  /** Deterministic synthetic data with a planted low-rank structure:
   *  points = a*u + b*w + small noise, u/w orthogonal. */
  private def planted(n: Int, d: Int, seed: Int): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    val u = Array.tabulate(d)(i => if (i % 2 == 0) 1.0 else 0.0)
    val w = Array.tabulate(d)(i => if (i % 2 == 1) 1.0 else 0.0)
    (1 to n).map { _ =>
      val a = rnd.nextGaussian() * 10
      val b = rnd.nextGaussian() * 3
      Array.tabulate(d)(i => (a * u(i) + b * w(i) + rnd.nextGaussian() * 0.01).toFloat)
    }
  }

  /** Independent local reference: covariance the naive way. */
  private def localCov(xs: Seq[Array[Float]]): Array[Array[Double]] = {
    val n = xs.size
    val d = xs.head.length
    val mu = Array.tabulate(d)(i => xs.map(_(i).toDouble).sum / n)
    Array.tabulate(d, d)((i, j) =>
      xs.map(x => (x(i) - mu(i)) * (x(j) - mu(j))).sum / n)
  }

  test("fit recovers the planted subspace; eigen residuals and orthonormality hold") {
    val data = planted(400, 16, seed = 3)
    val df = data.map(v => Tuple1(v)).toDF("embedding")
    val m = Pca.fit(df, "embedding", 4)
    assert(m.n == 400 && m.dim == 16)
    // eigenvalues descending, top two carry nearly all variance (planted 10^2 and 3^2)
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    assert(m.explainedE6.take(2).sum > 990000L,
      s"planted rank-2 structure: top-2 explained=${m.explainedE6.toSeq}")
    // residual ||C v - lambda v|| small, components orthonormal
    val cov = localCov(data)
    for (j <- m.components.indices) {
      val v = m.components(j)
      val cv = cov.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
      val res = cv.zip(v).map { case (a, b) => a - m.eigenvalues(j) * b }
        .map(x => x * x).sum
      assert(math.sqrt(res) < 1e-6, s"eigen residual $j: ${math.sqrt(res)}")
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9, s"component $j not unit")
      for (k <- 0 until j) {
        val dot = v.zip(m.components(k)).map { case (a, b) => a * b }.sum
        assert(math.abs(dot) < 1e-8, s"components $j,$k not orthogonal: $dot")
      }
    }
    // sign canonicalization: largest-|coordinate| entry is positive
    m.components.foreach { v =>
      val p = v.indices.maxBy(r => (math.abs(v(r)), -r))
      assert(v(p) > 0, "sign canonicalization")
    }
  }

  test("jacobi matches a hand-checkable 2x2 and cross-partition fits agree to tolerance") {
    val (vals, _) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(vals.sorted.zip(Seq(1.0, 3.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    val data = planted(300, 8, seed = 9)
    val df = data.map(v => Tuple1(v)).toDF("embedding")
    val a = Pca.fit(df.repartition(1), "embedding", 3)
    val b = Pca.fit(df.repartition(13), "embedding", 3)
    a.eigenvalues.zip(b.eigenvalues).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-6 * math.max(1.0, math.abs(x)),
        s"eigenvalues across partitionings: $x vs $y")
    }
    a.components.zip(b.components).foreach { case (u, v) =>
      val dot = u.zip(v).map { case (x, y) => x * y }.sum
      assert(math.abs(math.abs(dot) - 1.0) < 1e-6, s"component alignment |dot|=$dot")
    }
  }

  test("transform projects map-only; projected variance matches eigenvalues; guards fire") {
    val data = planted(500, 12, seed = 5)
    val df = data.map(v => Tuple1(v)).toDF("embedding")
    val m = Pca.fit(df, "embedding", 2)
    val proj = Pca.transform(df, "embedding", m)
    assert(proj.columns.toSeq == Seq("embedding", "proj"))
    val ps = proj.select("proj").as[Seq[Double]].collect()
    for (j <- 0 until 2) {
      val col = ps.map(_(j))
      val mu = col.sum / col.size
      val variance = col.map(x => (x - mu) * (x - mu)).sum / col.size
      assert(math.abs(variance - m.eigenvalues(j)) < 1e-4 * math.max(1.0, m.eigenvalues(j)),
        s"projected variance $variance != lambda ${m.eigenvalues(j)}")
      assert(math.abs(mu) < 1e-9, "projections are centered")
    }
    // the projection plan is a single map-only Project over the scan
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"transform must not shuffle:\n$plan")
    assert(intercept[IllegalArgumentException](
      Pca.fit(df, "embedding", 0)).getMessage.contains("[1, 12]"))
    assert(intercept[IllegalArgumentException](
      Pca.fit(df.limit(1), "embedding", 1)).getMessage.contains("at least 2"))
    val ragged = Seq(Tuple1(Array(1f, 2f)), Tuple1(Array(1f, 2f, 3f))).toDF("embedding")
    assert(intercept[Exception](Pca.fit(ragged, "embedding", 1))
      .getMessage.contains("ragged"))
  }

  test("fit on the real embeddings table composes with transform") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val m = Pca.fit(emb, "embedding", 8)
    assert(m.dim == 64 && m.eigenvalues.forall(_ >= -1e-9))
    val out = Pca.transform(emb, "embedding", m)
      .select("vec_id", "proj")
    assert(out.count() == emb.count())
    assert(out.select(size($"proj")).distinct().as[Int].head() == 8)
  }
}
