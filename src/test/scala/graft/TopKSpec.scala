package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TopK

/**
 * The bounded-heap top-k combiner (TopK.partitionTopK) is the piece
 * that keeps ANN/kNN ranking windows from sorting |corpus| rows on
 * one task per query. Two contracts:
 *   1. LOSSLESS: combiner + window == bare window, row for row,
 *      including rounding ties and the -0.0/0.0 boundary.
 *   2. BOUNDED: the window's input carries at most
 *      numPartitions * k rows per group.
 */
class TopKSpec extends SparkSpecBase {
  import spark.implicits._

  // scores from a tiny discrete set => heavy rounding ties, so the
  // id tie-break path is actually exercised; 8 input partitions
  private def corpus() = {
    spark.range(4000)
      .select(
        (col("id") % 7).as("q_id"),
        col("id").as("c_id"),
        // 11 distinct values in [-0.5, 0.5]; includes exact 0.0
        ((pmod(col("id") * 2654435761L, lit(11L)) - 5L).cast("double") / 10.0).as("score"))
      .repartition(8)
  }

  private def bareWindow(df: org.apache.spark.sql.DataFrame, k: Int, asc: Boolean) = {
    val ord = if (asc) round(col("score"), 9).asc else round(col("score"), 9).desc
    val w = Window.partitionBy(col("q_id")).orderBy(ord, col("c_id").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  for (asc <- Seq(true, false)) {
    test(s"combiner + window == bare window (ascending=$asc)") {
      val df = corpus()
      val k = 5
      val pre = TopK.partitionTopK(df, "q_id", "c_id", "score", k, ascending = asc)
      val got = bareWindow(pre, k, asc).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      val want = bareWindow(df, k, asc).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      assert(got == want)
    }

    test(s"window input bounded by partitions * k per group (ascending=$asc)") {
      val df = corpus()
      val k = 5
      val nPart = df.rdd.getNumPartitions
      val pre = TopK.partitionTopK(df, "q_id", "c_id", "score", k, ascending = asc)
      val perGroup = pre.groupBy("q_id").count().collect()
      assert(perGroup.nonEmpty)
      perGroup.foreach { r =>
        assert(r.getLong(1) <= nPart.toLong * k,
          s"group ${r.get(0)}: ${r.getLong(1)} rows > $nPart * $k")
      }
    }
  }

  test("lossless across the -0.0/0.0 and round-to-zero boundary") {
    // -1e-12 rounds to 0 at scale 9; -0.0 and 0.0 must order as equal
    // in the heap exactly as Spark's window treats them, for both
    // directions — the id tie-break decides, not the zero's sign
    val df = Seq(
      (1L, 10L, 0.0), (1L, 3L, -0.0), (1L, 7L, -1e-12), (1L, 5L, 1e-12),
      (1L, 2L, 0.1), (1L, 9L, -0.1),
      (2L, 4L, -0.0), (2L, 1L, 0.0)
    ).toDF("q_id", "c_id", "score").repartition(3)
    for (asc <- Seq(true, false); k <- Seq(1, 2, 3)) {
      val pre = TopK.partitionTopK(df, "q_id", "c_id", "score", k, ascending = asc)
      val got = bareWindow(pre, k, asc).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      val want = bareWindow(df, k, asc).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      assert(got == want, s"asc=$asc k=$k")
    }
  }

  test("null scores are dropped (window with nulls-last semantics unaffected within k)") {
    val df = Seq((1L, 1L, Some(0.5)), (1L, 2L, None), (1L, 3L, Some(0.7)))
      .toDF("q_id", "c_id", "score")
    val pre = TopK.partitionTopK(df, "q_id", "c_id", "score", 2, ascending = false)
    assert(pre.filter(col("score").isNull).count() == 0)
    assert(pre.count() == 2)
  }

  test("maybePartitionTopK degrades to identity for non-long ids") {
    val df = Seq(("a", "x", 0.5), ("a", "y", 0.7)).toDF("q_id", "c_id", "score")
    val out = TopK.maybePartitionTopK(df, "q_id", "c_id", "score", 1, ascending = false)
    assert(out.count() == 2) // untouched: no combiner, no row dropped
  }

  test("ann ranking plans carry a bounded pre-window stage") {
    // the three ANN entry points flagged at r6 now route their ranking
    // through the combiner: their physical plans must contain the
    // mapPartitions barrier BELOW the window
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val plans = Seq(
      "bruteforce" -> graft.operators.Ann.bruteForceTopK(emb, qs, "vec_id", "embedding", "q_id", "q_vec", 3),
      "quantized" -> graft.operators.Quantize.quantizedTopK(emb, qs, "vec_id", "embedding", "q_id", "q_vec", 3),
      "pq" -> graft.operators.Quantize.pqTopK(emb, qs, "vec_id", "embedding", "q_id", "q_vec", 3))
    plans.foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("MapPartitions"), s"$name: no combiner stage in plan:\n$plan")
      assert(df.count() > 0, name)
    }
  }
}
