package graft

import graft.operators.{Ann, Quantize}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}

class QuantizeSpec extends SparkSpecBase {
  import spark.implicits._

  private def vecs(n: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  test("int8 quantization: byte storage, values bounded, max element hits ±127, zero vector → zeros") {
    val df = Quantize.withQuantized(
      Seq((1L, Array(0.5f, -1.0f, 0.25f)), (2L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding"),
      "embedding")
    assert(df.schema("qvec").dataType == ArrayType(ByteType, containsNull = false),
      "quantized vectors must be REAL byte arrays (4x smaller than f32)")
    val rows = df.orderBy("vec_id").collect()
    val q1 = rows(0).getSeq[Byte](rows(0).fieldIndex("qvec"))
    assert(q1 == Seq[Byte](64, -127, 32), s"symmetric scaling: got $q1")
    assert(rows(0).getDouble(rows(0).fieldIndex("qscale")) == 1.0 / 127.0)
    assert(rows(1).getSeq[Byte](rows(1).fieldIndex("qvec")) == Seq[Byte](0, 0, 0))
    assert(rows(1).getDouble(rows(1).fieldIndex("qscale")) == 0.0)
  }

  test("quantized cosine: self-similarity 1, quantization error small") {
    val df = Quantize.withQuantized(vecs(50, 64, 3), "embedding")
    val stats = df.select(
        graft.functions.native.quantCos(col("qvec"), col("qvec")).as("self"),
        graft.functions.native.cosineSim(col("embedding"), col("embedding")).as("exact"))
      .agg(min("self"), max("self")).collect()(0)
    assert(math.abs(stats.getDouble(0) - 1.0) < 1e-12 && math.abs(stats.getDouble(1) - 1.0) < 1e-12)
    // cross-pair error bound: int8 keeps cosine within ~1e-2
    val err = df.as("a").crossJoin(df.as("b"))
      .select(abs(graft.functions.native.quantCos($"a.qvec", $"b.qvec") -
        graft.functions.native.cosineSim($"a.embedding", $"b.embedding")).as("e"))
      .agg(max("e")).collect()(0).getDouble(0)
    assert(err < 0.02, s"quantized cosine drifted $err from exact")
  }

  test("quantizedTopK: top-1 is the query itself; refine recall vs brute force") {
    val corpus = vecs(200, 64, 11)
    val queries = corpus.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val got = Quantize.quantizedTopK(corpus, queries, "vec_id", "embedding", "q_id", "q_vec", k = 5)
    val top1 = got.filter($"rn" === 1).collect()
    assert(top1.forall(r => r.getLong(0) == r.getLong(1)), "rank 1 must be the query vector itself")
    // with refineFactor 4 on random data the exact top-5 should match brute force
    val exact = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", "q_id", "q_vec", k = 5)
      .select("q_id", "vec_id", "rn").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fast = got.select("q_id", "vec_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert((exact intersect fast).size >= 20, s"expected >=20/25 agreement with brute force, got ${(exact intersect fast).size}")
  }

  test("int8_quantize / quant_cos are registered as SQL functions") {
    val r = spark.sql(
      "SELECT quant_cos(int8_quantize(array(1.0, 2.0, -3.0)), int8_quantize(array(1.0, 2.0, -3.0))) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("pqEncode: codes bounded by ksub, deterministic, sampled rows encode to themselves") {
    val corpus = vecs(100, 64, 7)
    val cb = Quantize.pqCodebook(corpus, "vec_id", "embedding", m = 4, ksub = 16)
    assert(cb.length == 4 && cb.forall(_.length == 16) && cb.forall(_.forall(_.length == 16)))
    val enc = Quantize.pqEncode(corpus, "embedding", cb)
      .select($"vec_id", $"pq_codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc.size == 100 && enc.values.forall(c => c.length == 4 && c.forall(j => j >= 0 && j < 16)))
    // a vector that IS codeword j in every subspace must encode to (j,j,j,j):
    // its subspace distance to itself is exactly 0
    val sampled = corpus.withColumn("__h", graft.operators.SamplingTestAccess.knuthHash($"vec_id"))
      .orderBy($"__h", $"vec_id").limit(16).select("vec_id").as[Long].collect()
    sampled.zipWithIndex.foreach { case (id, j) =>
      assert(enc(id) == Seq(j, j, j, j), s"sample row $id must self-encode to codeword $j")
    }
  }

  test("pqTopK: top-1 is the query itself; candidate recall vs brute force") {
    val corpus = vecs(200, 64, 13)
    val queries = corpus.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val got = Quantize.pqTopK(corpus, queries, "vec_id", "embedding", "q_id", "q_vec",
      k = 5, m = 4, ksub = 16, refineFactor = 8)
    val rows = got.collect()
    assert(rows.length == 25, s"5 queries x k=5: got ${rows.length}")
    val top1 = rows.filter(_.getLong(3) == 1L)
    assert(top1.forall(r => r.getLong(0) == r.getLong(1)),
      "rank 1 must be the query vector itself (its own codes minimize ADC to 0-reconstruction error)")
    // l2 must be nonneg and nondecreasing within each query
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ds = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(ds.head >= 0 && ds.zip(ds.tail).forall { case (a, b) => a <= b + 1e-9 })
    }
  }

  test("pqTopK plan: no Exchange carries a vector column (codes-only candidate scan)") {
    val corpus = vecs(60, 64, 17)
    val queries = corpus.limit(2).select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val plan = Quantize.pqTopK(corpus, queries, "vec_id", "embedding", "q_id", "q_vec", k = 3)
      .queryExecution.executedPlan.toString
    val offenders = plan.linesIterator.filter(_.contains("Exchange"))
      .filter(l => l.contains("embedding") || l.contains("q_vec") || l.contains("pq_codes"))
      .toSeq
    assert(offenders.isEmpty, s"vectors/codes must not ride a shuffle:\n${offenders.mkString("\n")}")
  }

  test("ivfPqTopK: top-1 self-recall; pairs only from probed cells; no Exchange carries vectors or codes") {
    val corpus = vecs(200, 64, 13)
    val queries = corpus.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val got = Quantize.ivfPqTopK(corpus, queries, "vec_id", "embedding", "q_id", "q_vec",
      k = 5, nCells = 8, nprobe = 3, m = 4, ksub = 16, refineFactor = 8)
    val rows = got.collect()
    assert(rows.length == 25, s"5 queries x k=5: got ${rows.length}")
    assert(rows.filter(_.getLong(3) == 1L).forall(r => r.getLong(0) == r.getLong(1)),
      "rank 1 must be the query itself (its own cell is its nearest probe; its own codes minimize ADC)")
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ds = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(ds.head >= 0 && ds.zip(ds.tail).forall { case (a, b) => a <= b + 1e-9 })
    }
    // every returned pair must come from a probed cell: recompute
    // assignment + probes independently and cross-check membership
    val cellsOf = Ann.ivfAssign(corpus, "vec_id", "embedding", nCells = 8)
      .select($"vec_id", $"__cid").as[(Long, Long)].collect().toMap
    val probes = rows.map(_.getLong(0)).distinct.map { q =>
      q -> Ann.ivfTopK(corpus, queries.filter($"q_id" === q), "vec_id", "embedding",
        "q_id", "q_vec", k = 200, nCells = 8, nprobe = 3)
        .select($"vec_id").as[Long].collect().map(cellsOf).toSet
    }.toMap
    rows.foreach(r => assert(probes(r.getLong(0)).contains(cellsOf(r.getLong(1))),
      s"pair (${r.getLong(0)}, ${r.getLong(1)}) not in a probed cell"))
    val plan = got.queryExecution.executedPlan.toString
    val offenders = plan.linesIterator.filter(_.contains("Exchange"))
      .filter(l => l.contains("embedding") || l.contains("q_vec") || l.contains("pq_codes"))
      .toSeq
    assert(offenders.isEmpty, s"vectors/codes must not ride a shuffle:\n${offenders.mkString("\n")}")
  }

  test("hardNegatives: band respected, anchor/self excluded, equals brute-force-then-band") {
    val corpus = vecs(150, 64, 23)
    val queries = corpus.filter($"vec_id" < 4)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val (lo, hi) = (0.02, 0.9)
    val got = Ann.hardNegatives(corpus, queries, "vec_id", "embedding", "q_id", "q_vec",
      k = 5, loCos = lo, hiCos = hi).collect()
    assert(got.nonEmpty && got.length <= 20)
    got.foreach { r =>
      val c = BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(c >= lo && c < hi, s"cos out of band: $r")
      assert(r.getLong(0) != r.getLong(1), "the anchor itself (cos ~ 1) must never appear")
    }
    // oracle: exact brute-force ranking restricted to the band
    val brute = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", "q_id", "q_vec", k = 150)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (_, _, c) =>
        val r9 = BigDecimal(c).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        r9 >= lo && r9 < hi
      }
      .groupBy(_._1).toSeq.flatMap { case (q, rs) =>
        rs.sortBy { case (_, id, c) =>
          (-BigDecimal(c).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble, id)
        }.take(5).map(t => (q, t._2)).toSeq
      }.toSet
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == brute)
  }

  test("hardNegativesIvf: nprobe = nCells equals the brute band path; no Exchange carries vectors") {
    val corpus = vecs(150, 64, 23)
    val queries = corpus.filter($"vec_id" < 4)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val (lo, hi) = (0.02, 0.9)
    // full probing degenerates to the brute-force-then-band result exactly
    val full = Ann.hardNegativesIvf(corpus, queries, "vec_id", "embedding", "q_id", "q_vec",
      k = 5, loCos = lo, hiCos = hi, nCells = 8, nprobe = 8)
    val brute = Ann.hardNegatives(corpus, queries, "vec_id", "embedding", "q_id", "q_vec",
      k = 5, loCos = lo, hiCos = hi)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(rows(full) == rows(brute), "nprobe = nCells must reproduce the brute band result")
    // pruned probing: band respected, results drawn only from probed cells
    val pruned = Ann.hardNegativesIvf(corpus, queries, "vec_id", "embedding", "q_id", "q_vec",
      k = 5, loCos = lo, hiCos = hi, nCells = 8, nprobe = 3)
    val got = pruned.collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val c = BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(c >= lo && c < hi, s"cos out of band: $r")
      assert(r.getLong(0) != r.getLong(1), "the anchor itself must never appear")
    }
    val cellsOf = Ann.ivfAssign(corpus, "vec_id", "embedding", nCells = 8)
      .select($"vec_id", $"__cid").as[(Long, Long)].collect().toMap
    val probesOf = Ann.ivfTopK(corpus, queries, "vec_id", "embedding", "q_id", "q_vec",
        k = 150, nCells = 8, nprobe = 3)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ps) => q -> ps.map(p => cellsOf(p._2)).toSet }
    got.foreach(r => assert(probesOf(r.getLong(0)).contains(cellsOf(r.getLong(1))),
      s"pair (${r.getLong(0)}, ${r.getLong(1)}) not from a probed cell"))
    val plan = pruned.queryExecution.executedPlan.toString
    val offenders = plan.linesIterator.filter(_.contains("Exchange"))
      .filter(l => l.contains("embedding") || l.contains("q_vec"))
      .toSeq
    assert(offenders.isEmpty, s"vectors must not ride a shuffle:\n${offenders.mkString("\n")}")
  }

  test("hardNegatives: loud guard on an unbounded anchor side") {
    val corpus = vecs(50, 16, 29)
    val anchors = corpus.select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val e = intercept[IllegalArgumentException] {
      Ann.hardNegatives(corpus, anchors, "vec_id", "embedding", "q_id", "q_vec",
        k = 3, loCos = 0.0, hiCos = 0.9, maxAnchors = 10)
    }
    assert(e.getMessage.contains("hardNegativesIvf"),
      s"guard must point at the corpus-scale path: ${e.getMessage}")
  }

  test("quantizedTopK plan: no Exchange carries a vector column") {
    val corpus = vecs(50, 16, 5)
    val queries = corpus.limit(2).select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val plan = Quantize.quantizedTopK(corpus, queries, "vec_id", "embedding", "q_id", "q_vec", k = 3)
      .queryExecution.executedPlan.toString
    // every shuffle row must be (ids, scores) only — scan the Exchange
    // lines for array-typed attributes
    val offenders = plan.linesIterator.filter(_.contains("Exchange"))
      .filter(l => l.contains("embedding") || l.contains("q_vec") || l.contains("__cq") || l.contains("__qq"))
      .toSeq
    assert(offenders.isEmpty, s"vector columns must not ride a shuffle:\n${offenders.mkString("\n")}")
  }
}
