package graft

import graft.operators.Ann
import org.apache.spark.sql.functions._

class KmeansSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  test("kmeans codebook: every corpus row counted exactly once, all dims present") {
    val out = Ann.kmeansCodebook(emb, "vec_id", "embedding", nCells = 8, iters = 2).cache()
    val total = emb.count()
    // n is per-(cid, i); each member contributes to every i, so the
    // sum over any single component index must equal the corpus size
    assert(out.filter($"i" === 1).agg(sum("n")).as[Long].head() == total)
    val dims = out.groupBy("cid").agg(countDistinct("i").as("d")).select("d").distinct().as[Long].collect()
    assert(dims.toSeq == Seq(64L), s"every cell must carry all 64 components, got $dims")
    out.unpersist()
  }

  test("kmeans is partitioning-invariant (fixed-point means, not float accumulation)") {
    val a = Ann.kmeansCodebook(emb, "vec_id", "embedding", nCells = 4, iters = 2)
      .orderBy("cid", "i").collect().toSeq
    val b = Ann.kmeansCodebook(emb.repartition(7), "vec_id", "embedding", nCells = 4, iters = 2)
      .orderBy("cid", "i").collect().toSeq
    assert(a == b, "codebook must be bit-identical across input partitionings")
  }

  test("kmeans centroids move from the init sample (training actually updates)") {
    val init = Ann.kmeansCodebook(emb, "vec_id", "embedding", nCells = 4, iters = 1)
      .orderBy("cid", "i").select("v_e6").as[Long].collect().toSeq
    val trained = Ann.kmeansCodebook(emb, "vec_id", "embedding", nCells = 4, iters = 3)
      .orderBy("cid", "i").select("v_e6").as[Long].collect().toSeq
    assert(init != trained, "3 Lloyd iterations must differ from 1 on non-degenerate data")
  }

  test("empty cells keep their previous centroid and are omitted from final stats") {
    // three identical vectors: both sampled centroids coincide, the
    // cid-ascending tie-break sends every row to one cell, the other
    // cell goes empty and must be dropped from the trained stats
    val df = Seq((1L, Array(1f, 0f)), (2L, Array(1f, 0f)), (3L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Ann.kmeansCodebook(df, "vec_id", "embedding", nCells = 2, iters = 2)
      .orderBy("cid", "i").collect()
    assert(out.map(_.get(0)).distinct.length == 1, "exactly one non-empty cell expected")
    assert(out.head.getLong(3) == 3L, "the surviving cell holds all three rows")
    val cents = Ann.kmeansCentroids(df, "vec_id", "embedding", nCells = 2, iters = 2)
    assert(cents.length == 1 && cents.head._2 == Seq(1f, 0f))
  }

  test("mmrSelect: diversity penalty beats raw relevance; lambda=1 is pure relevance") {
    // two tight clusters on orthogonal axes; all of cluster A slightly
    // more relevant than cluster B
    val df = Seq(
      (1L, Array(1f, 0f, 0f), 0.99),
      (2L, Array(0.999f, 0.04f, 0f), 0.98),
      (3L, Array(0.999f, -0.04f, 0f), 0.97),
      (4L, Array(0f, 1f, 0f), 0.60),
      (5L, Array(0f, 0.999f, 0.04f), 0.59)
    ).toDF("id", "v", "rel")
    val picks = Ann.mmrSelect(df, "id", "v", "rel", k = 2, lambda = 0.5)
      .orderBy("rank").collect().map(_.getLong(0)).toSeq
    assert(picks == Seq(1L, 4L),
      s"second pick must jump to the other cluster, got $picks")
    val pure = Ann.mmrSelect(df, "id", "v", "rel", k = 3, lambda = 1.0)
      .orderBy("rank").collect().map(_.getLong(0)).toSeq
    assert(pure == Seq(1L, 2L, 3L), s"lambda=1 ignores diversity, got $pure")
  }

  test("mmrSelect: k > candidates returns all; candidate-bound guard trips") {
    val df = Seq((1L, Array(1f, 0f), 0.9), (2L, Array(0f, 1f), 0.8)).toDF("id", "v", "rel")
    val all = Ann.mmrSelect(df, "id", "v", "rel", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq.sortBy(_._2)
    assert(all == Seq((1L, 1L), (2L, 2L)))
    val e = intercept[IllegalArgumentException] {
      Ann.mmrSelect(df, "id", "v", "rel", k = 1, maxCandidates = 1)
    }
    assert(e.getMessage.contains("bounded"))
  }

  test("mmrSelect: non-parseable id types survive the round trip natively") {
    // binary ids stringify as "[B@..." — the old toString + cast-back
    // path silently nulled them; picks must come back byte-identical
    val df = Seq(
      (Array[Byte](1, 2), Array(1f, 0f), 0.9),
      (Array[Byte](3, 4), Array(0f, 1f), 0.8)
    ).toDF("id", "v", "rel")
    val out = Ann.mmrSelect(df, "id", "v", "rel", k = 2)
      .orderBy("rank").collect()
    assert(out.forall(!_.isNullAt(0)), "binary ids must not null out")
    assert(out.map(_.getAs[Array[Byte]](0).toSeq).toSet ==
      Set(Seq[Byte](1, 2), Seq[Byte](3, 4)))
  }
}
