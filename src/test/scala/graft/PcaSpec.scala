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
    // explainedE6 honesty: the denominator is the FULL trace, so
    // fitting m=4 on ISOTROPIC 16-dim noise must report ~25%, never
    // ~100% (the retained-sum denominator bug this guards against)
    val rnd = new scala.util.Random(41)
    val iso = (1 to 400).map(_ => Tuple1(Array.fill(16)(rnd.nextGaussian().toFloat))).toDF("embedding")
    val mIso = Pca.fit(iso, "embedding", 4)
    assert(mIso.explainedE6.sum < 500000L && mIso.explainedE6.sum > 150000L,
      s"isotropic 4/16 must explain ~25%: ${mIso.explainedE6.sum}")
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

  test("pca earns its keep: 8-dim candidate search + full-dim rerank recovers full-space neighbors") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    // rank-8 planted corpus: 8 orthogonal Walsh (+-1 parity) directions
    // with decaying scales + small isotropic noise. (The synthetic
    // embeddings table is NOT low-rank -- ~half its variance lives in
    // the tail dims, so no 8-dim sketch can preserve ITS neighbors;
    // the funnel property needs data with actual structure.)
    val rnd = new scala.util.Random(23)
    def walsh(j: Int, i: Int): Double =
      if (java.lang.Integer.bitCount(i & j) % 2 == 0) 1.0 else -1.0
    val dirs = Seq(1, 2, 4, 8, 16, 32, 3, 5) // distinct masks -> orthogonal Walsh rows
    val data = (1 to 500).map { id =>
      val coefs = dirs.indices.map(j => rnd.nextGaussian() * (10.0 - j))
      (id.toLong, Array.tabulate(64) { i =>
        (dirs.indices.map(j => coefs(j) * walsh(dirs(j), i)).sum
          + rnd.nextGaussian() * 0.05).toFloat
      })
    }
    val emb = data.toDF("vec_id", "embedding")
    val m = Pca.fit(emb, "embedding", 8)
    assert(m.explainedE6.sum > 990000L,
      s"8 planted directions must carry ~all variance: ${m.explainedE6.sum}")
    // L2 is what an orthogonal projection preserves (centering is a
    // translation -- pairwise distances unchanged; only the discarded
    // dims' variance distorts). Truth: exact full-space L2 top-5.
    val queries = emb.limit(8).select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def rank5(scored: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = scored
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(round(col("d"), 9).asc, col("vec_id").asc)))
      .filter(col("rn") <= 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = rank5(emb.crossJoin(broadcast(queries))
      .withColumn("d", graft.functions.native.l2Sq(col("embedding"), col("q_vec"))))
    // candidates from the 8-dim projections (4x over-fetch), exact
    // full-space rerank of the bounded candidate list only
    val reduced = Pca.transform(emb, "embedding", m)
      .select(col("vec_id"), col("proj").cast("array<float>").as("rvec"))
    val rQueries = Pca.transform(queries, "q_vec", m)
      .select(col("q_id"), col("proj").cast("array<float>").as("rq"))
    val cand = reduced.join(broadcast(rQueries))
      .withColumn("d", graft.functions.native.l2Sq(col("rvec"), col("rq")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(round(col("d"), 9).asc, col("vec_id").asc)))
      .filter(col("rn") <= 20)
      .select("q_id", "vec_id")
    val reranked = rank5(cand
      .join(emb, "vec_id")
      .join(queries, "q_id")
      .withColumn("d", graft.functions.native.l2Sq(col("embedding"), col("q_vec"))))
    val recalls = truth.keys.toSeq.map { q =>
      (truth(q) intersect reranked.getOrElse(q, Set.empty)).size.toDouble / truth(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.85, s"mean recall@5 through the 8-dim L2 funnel: $mean (${recalls.sorted})")
  }

  test("random projection: JL distance preservation, determinism, map-only, no fit pass") {
    val rnd = new scala.util.Random(53)
    val data = (1L to 60L).map(id => (id, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val df = data.toDF("vec_id", "embedding")
    val proj = Pca.randomProjection(df, "embedding", dim = 64, m = 32)
    assert(!proj.queryExecution.executedPlan.toString.contains("Exchange"),
      "projection must be map-only")
    val p = proj.select("vec_id", "rproj").as[(Long, Seq[Double])].collect().toMap
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val orig = data.map { case (id, v) => id -> v.map(_.toDouble).toSeq }.toMap
    val ratios = for {
      i <- data.map(_._1); j <- data.map(_._1) if i < j
    } yield d2(p(i), p(j)) / d2(orig(i), orig(j))
    assert(ratios.forall(r => r > 0.3 && r < 2.2),
      s"JL distortion envelope at m=32: [${ratios.min}, ${ratios.max}]")
    val meanDev = ratios.map(r => math.abs(r - 1)).sum / ratios.size
    assert(meanDev < 0.25, s"mean distance distortion should be small: $meanDev")
    // deterministic: same seed -> identical projections; different seed -> different
    val again = Pca.randomProjection(df.repartition(5), "embedding", 64, 32)
      .select("vec_id", "rproj").as[(Long, Seq[Double])].collect().toMap
    assert(again == p, "same seed must reproduce bit-identically across partitionings")
    val other = Pca.randomProjection(df, "embedding", 64, 32, seed = 7L)
      .select("rproj").as[Seq[Double]].head()
    assert(other != p(1L), "different seed must project differently")
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
