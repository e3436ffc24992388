package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over embedding columns.
 *
 *  - bruteForceTopK: exact cosine top-k — the correctness baseline.
 *    Queries are broadcast (small side), so the scan of the corpus
 *    is a single pass with no corpus shuffle; ranking is a window
 *    keyed by query id.
 *  - lshTopK: the 100 TB scale path — random-hyperplane signatures
 *    (seeded, deterministic) bucket the corpus; candidates come from
 *    an equi-join on the signature, top-k ranked within candidates.
 */
object Ann {

  /** Exact top-k by cosine for each query vector (queries must be small/broadcastable). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     corpusId: String, corpusVec: String,
                     queryId: String, queryVec: String, k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .withColumn("cos", Dedup.cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(round(col("cos"), 9).desc, col(corpusId).asc)
    joined.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col(queryId), col(corpusId), col("cos"), col("rn"))
  }

  /** Deterministic pseudo-random hyperplanes (seeded), as literal float-array columns. */
  private def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Seq[Column] = {
    val rnd = new scala.util.Random(seed)
    (0 until numPlanes).map { _ =>
      typedLit((0 until dim).map(_ => rnd.nextGaussian().toFloat).toArray)
    }
  }

  /** Random-hyperplane signature (one bit per plane) of a vector column — codegen dot kernel. */
  def lshSignature(vec: Column, numPlanes: Int, dim: Int, seed: Long = 42L): Column =
    hyperplanes(numPlanes, dim, seed).zipWithIndex.map { case (plane, j) =>
      when(graft.functions.native.dot(vec, plane) >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /**
   * IVF (inverted-file) ANN: a deterministic sample of corpus
   * vectors acts as the centroid codebook; every corpus vector is
   * assigned to its nearest centroid (one broadcast pass), queries
   * probe the `nprobe` nearest cells and rank candidates by exact
   * cosine. The 100 TB shape: the corpus is scanned once to build
   * the cell assignment (which can be persisted alongside the data
   * as a bucketing column), and each query touches only
   * nprobe/nCells of the data.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              corpusId: String, corpusVec: String,
              queryId: String, queryVec: String,
              k: Int, nCells: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    // deterministic codebook: hash-sampled corpus vectors
    val cents = corpus
      .withColumn("__h", abs(xxhash64(col(corpusId))) % lit(1000000))
      .orderBy(col("__h"), col(corpusId)).limit(nCells)
      .select(col(corpusId).as("__cid"), col(corpusVec).as("__cvec"))

    def nearestCells(df: DataFrame, idC: String, vec: String, n: Int): DataFrame =
      df.crossJoin(broadcast(cents))
        .withColumn("__csim", Dedup.cosine(col(vec), col("__cvec")))
        .withColumn("__crn", row_number().over(
          Window.partitionBy(col(idC)).orderBy(round(col("__csim"), 9).desc, col("__cid").asc)))
        .filter(col("__crn") <= n)
        .drop("__cvec", "__csim", "__crn")

    val assigned = nearestCells(corpus, corpusId, corpusVec, 1) // cell per corpus vector
    val probed = nearestCells(queries, queryId, queryVec, nprobe) // nprobe cells per query
      .select(col("__cid"), col(queryId), col(queryVec))

    val cand = assigned.join(broadcast(probed), "__cid")
      .withColumn("cos", Dedup.cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(round(col("cos"), 9).desc, col(corpusId).asc)
    cand.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col(queryId), col(corpusId), col("cos"), col("rn"))
  }

  /**
   * LSH-bucketed ANN: candidates share the full signature bucket
   * (optionally banded for higher recall), ranked by exact cosine.
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              corpusId: String, corpusVec: String,
              queryId: String, queryVec: String,
              k: Int, dim: Int, numPlanes: Int = 12, bands: Int = 3, seed: Long = 42L): DataFrame = {
    val planesPerBand = numPlanes / bands
    val mask = (1L << planesPerBand) - 1
    def banded(df: DataFrame, vecCol: String): DataFrame = {
      val sig = lshSignature(col(vecCol), numPlanes, dim, seed)
      df.withColumn("__sig", sig)
        .select(col("*"), posexplode(array((0 until bands).map(b =>
          shiftrightunsigned(col("__sig"), b * planesPerBand).bitwiseAND(mask)): _*)))
        .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bsig")
    }
    val c = banded(corpus, corpusVec)
    val q = banded(queries, queryVec).select(col("__band"), col("__bsig"), col(queryId), col(queryVec))
    val cand = c.join(broadcast(q), Seq("__band", "__bsig"))
      .select(col(queryId), col(corpusId), col(corpusVec), col(queryVec)).distinct()
      .withColumn("cos", Dedup.cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(round(col("cos"), 9).desc, col(corpusId).asc)
    cand.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col(queryId), col(corpusId), col("cos"), col("rn"))
  }
}
