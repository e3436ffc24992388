package graft

import graft.operators.Sketch
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpecBase {
  import spark.implicits._

  private def idsDF(ids: Seq[Long], grp: String = "g") =
    ids.map((grp, _)).toDF("grp", "id")

  test("hll estimate lands inside the 1.04/sqrt(m) envelope across cardinalities") {
    // sequential AND strided ids — the lattice inputs that break a
    // single multiplicative round (measured +50% bias before the
    // two-round mixer). Cardinalities start at ~16m: below ~5m the
    // raw formula is biased by design (we skip the ln()-based
    // linear-counting correction for cross-engine determinism —
    // scaladoc'd contract)
    for ((n, stride) <- Seq((1500, 1L), (5000, 8L), (20000, 3L))) {
      val df = idsDF((0 until n).map(i => 1 + i * stride))
      val est = Sketch.hllDistinct(df, "grp", "id").select("hll_est_e2").as[Long].head() / 100.0
      val err = math.abs(est / n - 1)
      assert(err < 0.30, f"n=$n stride=$stride: est=$est%.0f err=${err * 100}%.1f%% (>2.3 sigma at m=64)")
    }
  }

  test("register table is bounded at groups x m rows and partitioning-invariant") {
    val df = idsDF((1L to 3000L), "a").union(idsDF((1L to 700L), "b"))
    val regs = Sketch.hllRegisters(df, "grp", "id").cache()
    assert(regs.count() <= 2 * 64)
    val a = regs.orderBy("grp", "bucket").collect().toSeq
    val b = Sketch.hllRegisters(df.repartition(7), "grp", "id").orderBy("grp", "bucket").collect().toSeq
    assert(a == b, "registers must be bit-identical across partitionings")
    regs.unpersist()
  }

  test("sharded registers merge to exactly the single-pass sketch") {
    val all = idsDF(1L to 5000L)
    val shard1 = idsDF(1L to 3000L)            // overlapping shards:
    val shard2 = idsDF(2500L to 5000L)         // max is idempotent
    val merged = Sketch.hllMerge(
      Sketch.hllRegisters(shard1, "grp", "id"),
      Sketch.hllRegisters(shard2, "grp", "id"))
    val direct = Sketch.hllRegisters(all, "grp", "id")
    assert(merged.orderBy("grp", "bucket").collect().toSeq ==
      direct.orderBy("grp", "bucket").collect().toSeq,
      "merge(shards) must equal sketch(union) — the distributed-count contract")
    // and the estimate path accepts merged registers
    val est = Sketch.hllEstimate(merged).select("hll_est_e2").as[Long].head() / 100.0
    assert(math.abs(est / 5000.0 - 1) < 0.30)
  }

  test("non-integral id column is rejected loudly") {
    val df = Seq(("g", "abc")).toDF("grp", "id")
    val e = intercept[IllegalArgumentException](Sketch.hllRegisters(df, "grp", "id"))
    assert(e.getMessage.contains("integral"))
  }
}
