package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Distributed graph operators for training-data pipelines — the stage
 * AFTER near-duplicate pair generation: pairs are edges, duplicate
 * GROUPS are connected components, and dedup keeps one canonical doc
 * per component.
 *
 * Re-expresses the duplicate-clustering step standard corpus dedup
 * pipelines bolt onto MinHash-LSH output (the reference engine stops
 * at spatial cross-match pairs; LLM-corpus dedup needs the transitive
 * closure too).
 */
object Graph {

  /**
   * Connected components by iterative min-label propagation: every
   * node's label converges to the smallest node id in its component.
   *
   * Scale shape: each iteration is one equi-join (messages along
   * edges) plus one map-side-combined min aggregate — standard
   * shuffles on the node id, no collects, no explosion beyond |E|.
   * Iterations are bounded by the component DIAMETER, which for
   * near-duplicate graphs (small dense clusters of mutual dups) is
   * tiny; `maxIter` guards pathological chains. Convergence is
   * detected with a single scalar aggregate (labels only ever
   * decrease, so an unchanged sum means a fixed point — no
   * per-iteration anti-join needed).
   *
   * Returns (id, comp) for every node incident to an edge.
   */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 30): DataFrame =
    connectedComponentsWithCache(pairs, aCol, bCol, maxIter)._1

  /** Per-iteration lineage truncation. `labels` feeds the next
   *  iteration TWICE (message join + self union), so without
   *  truncation the logical plan DOUBLES every round — exponential
   *  planning/analysis cost long before any data moves. Checkpointing
   *  materializes the iteration and restarts the plan from the stored
   *  blocks: reliable `.checkpoint` when the session has a checkpoint
   *  dir (cluster fault tolerance), executor-local otherwise. */
  private def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** The materialized RDD behind a checkpointed iteration, freed
   *  explicitly when the next iteration supersedes it —
   *  `Dataset.unpersist` is a NO-OP for checkpointed plans (their
   *  blocks live outside the CacheManager), so without this the
   *  per-iteration block sets pile up until a JVM GC happens to
   *  collect the old RDD objects. */
  private def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** Free a superseded iteration: cached blocks (local checkpoints)
   *  AND the reliable-checkpoint files — Spark only deletes those at
   *  shutdown when `spark.cleaner.referenceTracking.cleanCheckpoints`
   *  is set, so a long-lived session running repeated clusterings
   *  would otherwise fill the checkpoint filesystem. */
  private def free(df: DataFrame)(rdd: org.apache.spark.rdd.RDD[_]): Unit = {
    rdd.unpersist(false)
    rdd.getCheckpointFile.foreach { p =>
      try {
        val path = new org.apache.hadoop.fs.Path(p)
        path.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration).delete(path, true)
      } catch { case _: Exception => () } // best effort — the cleaner's job otherwise
    }
  }

  /** As [[connectedComponents]], additionally returning a release
   *  handle that frees the final label blocks. Call it only once the
   *  result is no longer needed (or has been written/persisted
   *  elsewhere): checkpointing truncates lineage, so a released
   *  result cannot be recomputed. Throws IllegalStateException if the
   *  propagation has not converged within `maxIter` rounds (component
   *  diameter exceeds the bound) — silently returning partial labels
   *  would corrupt downstream dedup. */
  def connectedComponentsWithCache(pairs: DataFrame, aCol: String, bCol: String,
                                   maxIter: Int = 30): (DataFrame, () => Unit) = {
    require(maxIter >= 1, s"maxIter must be >= 1: $maxIter")
    // non-numeric ids would cast to null, never equi-join, and return
    // every node as its own singleton component with no error
    Seq(aCol, bCol).foreach { c =>
      import org.apache.spark.sql.types._
      val dt = pairs.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"connectedComponents: edge column '$c' must be integral (found $dt) — " +
          "map string ids to numeric ids first")
    }
    val sym = pairs.select(col(aCol).cast("long").as("id"), col(bCol).cast("long").as("nb"))
      .union(pairs.select(col(bCol).cast("long").as("id"), col(aCol).cast("long").as("nb")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = truncate(
      sym.groupBy("id").agg(min("nb").as("mn"))
        .select(col("id"), least(col("id"), col("mn")).as("comp")))
    // labels are monotone non-increasing per node, so the label sum
    // strictly decreases until the fixed point — convergence is one
    // scalar aggregate over the checkpointed iteration, no anti-join.
    // decimal(38,0) accumulation: a Long sum could overflow-collide on
    // a 10^10-node graph and fake convergence while labels still move
    def checksum(df: DataFrame): String = {
      val r = df.agg(sum(col("comp").cast("decimal(38,0)"))).collect()(0)
      if (r.isNullAt(0)) "0" else r.getDecimal(0).toPlainString
    }
    var prevSum = checksum(labels)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val msgs = sym.join(labels, "id").select(col("nb").as("id"), col("comp"))
      val next = truncate(
        msgs.union(labels.select("id", "comp"))
          .groupBy("id").agg(min("comp").as("comp")))
      val s = checksum(next)
      backingRdd(labels).foreach(free(labels))
      labels = next
      converged = s == prevSum // String compare of exact decimals
      prevSum = s
      it += 1
    }
    sym.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within maxIter=$maxIter rounds — a component's " +
          "diameter exceeds the bound; raise maxIter (near-dup clusters are shallow, but chain-" +
          "shaped graphs need ~diameter rounds)")
    val out = labels
    (out, () => { backingRdd(out).foreach(free(out)); () })
  }

  /**
   * Corpus-scale duplicate clustering: LSH near-duplicate pairs
   * ([[Dedup.nearDuplicates]]) → connected components → one canonical
   * doc (the min id) per duplicate cluster. Every input row comes back
   * with its `cluster_id` (its own id when it has no near-dups) and an
   * `is_canonical` flag — filtering on the flag IS the dedup.
   */
  def dedupClusters(df: DataFrame, idCol: String, textCol: String,
                    minJaccard: Double = 0.8, numPerms: Int = 128, bands: Int = 32,
                    shingleN: Int = 3): DataFrame =
    dedupClustersWithCache(df, idCol, textCol, minJaccard, numPerms, bands, shingleN)._1

  /** As [[dedupClusters]], additionally returning a release handle
   *  for the component-label blocks — call it only once the result is
   *  no longer needed (checkpoint lineage is truncated, so released
   *  labels cannot be recomputed). */
  def dedupClustersWithCache(df: DataFrame, idCol: String, textCol: String,
                             minJaccard: Double = 0.8, numPerms: Int = 128, bands: Int = 32,
                             shingleN: Int = 3): (DataFrame, () => Unit) = {
    val (pairs, releasePairs) =
      Dedup.nearDuplicatesWithCache(df, idCol, textCol, minJaccard, numPerms, bands, shingleN)
    val (comp, releaseComp) = connectedComponentsWithCache(pairs, "id_a", "id_b")
    // component labels are fully materialized by the iteration's own
    // actions, so the (much heavier) pair/shingle cache can be dropped
    // now — consuming the result only re-reads the label cache
    releasePairs()
    val out = df.join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("comp"), col(idCol)))
      .withColumn("is_canonical", col("cluster_id") === col(idCol))
      .drop("comp")
    (out, releaseComp)
  }
}
