package graft

import org.apache.spark.sql.functions._

/**
 * Cache-lifetime convention regression (r13 verdict item 8): an
 * operator whose result is consumed once must leave NOTHING in the
 * session CacheManager — a library caller running many operators in
 * one long session must not need Bench's clearCache between queries.
 * The gcPersist sites additionally drain their RDD blocks via the
 * ContextCleaner once the caller drops the result.
 */
class CacheHygieneSpec extends SparkSpecBase {

  private def docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")

  test("gcPersist operators leave the session CacheManager empty") {
    spark.sharedState.cacheManager.clearCache()
    // each of these previously Dataset.persist-ed an intermediate
    // with no unpersist — a strong CacheManager reference that only
    // clearCache released
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    graft.operators.Graph.triangleCounts(edges, "a", "b").collect()
    graft.operators.Sketch.cmsCells(docs.select(col("doc_id")), "doc_id", 4, 10, reuseScan = true).collect()
    graft.operators.Associations.basketPairs(
      docs.select((col("doc_id") % 7).as("b"), (col("doc_id") % 13).as("i")),
      Seq("b"), "i").collect()
    graft.operators.Dedup.prefixFilterJoin(docs.limit(60), "doc_id", "text", t100 = 60).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "operators must not register Dataset-level cache entries the caller has to clear")
  }

  test("gcPersist blocks drain via the ContextCleaner after the result is dropped") {
    val sc = spark.sparkContext
    def persisted: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    val before = persisted
    // scope the result so the reference is droppable
    locally {
      import spark.implicits._
      val edges = Seq((10L, 20L), (20L, 30L), (10L, 30L)).toDF("a", "b")
      val n = graft.operators.Graph.triangleCounts(edges, "a", "b").count()
      assert(n > 0)
      assert((persisted -- before).nonEmpty, "the operator should have cached while live")
    }
    // ContextCleaner is GC-driven: force collections until the weak
    // refs enqueue and the cleaner unpersists (bounded wait)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while ((persisted -- before).nonEmpty && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(250)
    }
    assert((persisted -- before).isEmpty,
      s"gcPersist blocks must drain once the caller drops the result; leaked: ${persisted -- before}")
  }
}
