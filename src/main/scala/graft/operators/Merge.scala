package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/**
 * Upsert / MERGE-INTO semantics (the lakehouse SCD1 shape): fold a
 * batch of updates into a base snapshot keyed on `key` — matched
 * rows take the update's values, unmatched updates insert, unmatched
 * base rows carry over. One full-outer join on the key, column-wise
 * update-wins coalesce.
 *
 * Scale shape: the join shuffles on the key ONCE; when the base is
 * stored via [[Layout.writeBucketed]] on the key, the base side
 * reads pre-distributed and only the (small) update batch shuffles —
 * the standard nightly-merge layout at 100 TB. Deletes compose as a
 * left-anti join before the merge; full SCD2 history is the
 * incremental-append family's job ([[graft.catalog.Catalog]]).
 */
object Merge {

  /**
   * `updates` must be key-unique (enforced declaratively: a
   * duplicate update key raises at execution time — silently
   * merging an ambiguous batch is how snapshots fork). Schemas must
   * match on name; column order follows `base`.
   */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = base.columns
    require(cols.contains(key), s"Merge.upsert: base has no key column '$key'")
    require(updates.columns.sorted.sameElements(cols.sorted),
      s"Merge.upsert: schema mismatch — base [${cols.sorted.mkString(",")}] vs " +
        s"updates [${updates.columns.sorted.mkString(",")}]")
    // key-uniqueness guard folded INTO the update key expression (a
    // separate guard column would be pruned away, raise_error and
    // all): a duplicate key errors when the join evaluates the key.
    // The guard window runs over the UPDATE batch only — the small
    // side of a nightly merge.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
    val u = updates.withColumn("__n", count(lit(1)).over(w))
      .withColumn(key, when(col("__n") > 1, raise_error(concat(
        lit(s"Merge.upsert: duplicate update key in '$key': "), col(key).cast("string"))))
        .otherwise(col(key)))
      .drop("__n")
    // string-qualified refs, not parent-DataFrame refs: base and
    // updates may derive from the SAME frame (self-merge), where
    // df(col) references are ambiguous
    def bc(c: String) = col(s"__mb.$c")
    def uc(c: String) = col(s"__mu.$c")
    val joined = base.alias("__mb")
      .join(u.alias("__mu"), bc(key) === uc(key), "full_outer")
    val merged = cols.map { c =>
      (if (c == key) coalesce(uc(key), bc(key))
       else when(uc(key).isNotNull, uc(c)).otherwise(bc(c))).as(c)
    }
    joined.select(merged: _*)
  }

  /**
   * Batch changelog materialization — the DELETE-aware CDC fold
   * ([[upsertStream]] streams upserts; a real change feed also
   * carries deletes): collapse an ORDERED multi-version changelog to
   * each key's LAST operation with ONE struct-max aggregate (map-side
   * combinable — never a per-key window sort over the log), then one
   * full-outer join against the base snapshot. Last op = `deleteOp`
   * → the key is absent from the result; any other op wins over the
   * base value; untouched base rows carry over. Returns
   * (key, valueCol, status ∈ kept/updated/inserted, n_changes).
   *
   * `orderCols` must totally order each key's changes (e.g. a
   * timestamp + a unique change id) — ties would make "last" depend
   * on partitioning. Semantic limit: the value fold is
   * `coalesce(last-change value, base value)`, so an UPSERT carrying
   * a NULL value is indistinguishable from "keep the base value" — a
   * changelog cannot set a column to NULL (delete + re-insert if you
   * need that; the q_cdc oracle mirrors the coalesce, so parity
   * holds). Scale shape: the log collapses BEFORE the join,
   * so the join's log side carries one row per touched key; with the
   * base bucketed on the key ([[Layout.writeBucketed]]) only the
   * collapsed log shuffles.
   */
  def applyChangelog(base: DataFrame, log: DataFrame, key: String, valueCol: String,
                     opCol: String, deleteOp: String, orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "applyChangelog: orderCols must totally order each key's changes")
    val lastFields = orderCols.map(col) ++ Seq(col(opCol).as("__op"), col(valueCol).as("__v"))
    val last = log.groupBy(col(key))
      .agg(max(struct(lastFields: _*)).as("__l"), count(lit(1)).as("n_changes"))
      .select(col(key), col("__l.__op").as("__op"), col("__l.__v").as("__lv"), col("n_changes"))
    base.select(col(key), col(valueCol).as("__bv"))
      .join(last, Seq(key), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= deleteOp)
      .select(col(key),
        coalesce(col("__lv"), col("__bv")).as(valueCol),
        when(col("__op").isNull, "kept")
          .when(col("__bv").isNull, "inserted")
          .otherwise("updated").as("status"),
        coalesce(col("n_changes"), lit(0L)).as("n_changes"))
  }

  /**
   * Streaming apply (the CDC-apply shape): fold each micro-batch of
   * updates into a parquet snapshot — foreachBatch, keep-last per
   * key WITHIN the batch by `orderCol` (a micro-batch can carry
   * several versions of one key; picking the latest makes the fold
   * equal to replaying events in order), [[upsert]] into the current
   * snapshot, stage + atomic dir swap (the [[Layout.compact]]
   * rename discipline — readers see old or new, never a mix).
   *
   * Semantics: VERSION-AWARE, not last-writer-wins — an update lands
   * only if its `orderCol` is >= the snapshot row's (the
   * last-write-wins REGISTER fold, commutative and idempotent over
   * versions). So the final snapshot equals the global
   * keep-highest-version fold of the whole stream whatever the
   * micro-batch boundaries OR arrival order, and re-running a failed
   * batch is a no-op — foreachBatch's at-least-once becomes
   * effectively-once (both asserted in StreamingSpec with forced
   * multi-batch ingestion). At scale the snapshot lives bucketed on
   * the key ([[Layout.writeBucketed]]) so each apply shuffles only
   * the micro-batch.
   */
  def upsertStream(updates: DataFrame, snapshotDir: String, key: String,
                   orderCol: String, checkpointDir: String,
                   trigger: org.apache.spark.sql.streaming.Trigger =
                     org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, snapshotDir, key, orderCol)
      }
      .start()
  }

  /** One CDC apply step (extracted so batch tests and foreachBatch
   *  share the exact code path). */
  def applyBatch(batch: DataFrame, snapshotDir: String, key: String,
                 orderCol: String): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // tiebreak beyond (orderCol, key): key is the partition column
    // (constant within the window), so two same-version rows for one
    // key would otherwise get a PARTITIONING-DEPENDENT winner — a
    // replayed batch could then persist the other row. The row-hash
    // tiebreak makes keep-last a deterministic function of the data.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
      .orderBy(col(orderCol).desc, xxhash64(struct(batch.columns.map(col): _*)).asc)
    val latest = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val hPath = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val q = fs.makeQualified(hPath)
    // crash recovery BEFORE reading: a death between the swap renames
    // left the snapshot only at the _apply_old_ sibling
    recoverSnapshot(fs, q)
    val merged =
      if (!fs.exists(hPath)) latest
      else {
        // version-aware fold: the update wins only at orderCol >= the
        // snapshot's — NOT plain upsert (whose last-writer-wins would
        // make replays and out-of-order batches clobber newer rows)
        val base = spark.read.parquet(snapshotDir)
        val cols = base.columns
        def bc(c: String) = col(s"__cb.$c")
        def uc(c: String) = col(s"__cu.$c")
        val updateWins = uc(key).isNotNull &&
          (bc(key).isNull || uc(orderCol) >= bc(orderCol))
        base.alias("__cb")
          .join(latest.alias("__cu"), bc(key) === uc(key), "full_outer")
          .select(cols.map { c =>
            (if (c == key) coalesce(uc(key), bc(key))
             else when(updateWins, uc(c)).otherwise(bc(c))).as(c)
          }: _*)
      }
    atomicSwap(fs, merged, q)
  }

  /** Stage + two-rename swap (the Layout.compact discipline):
   *  trailing-slash-safe, underscore-prefixed staging invisible to
   *  partition discovery; a crash between renames recovers on the
   *  next apply's [[recoverSnapshot]]. */
  private def atomicSwap(fs: org.apache.hadoop.fs.FileSystem,
                         merged: DataFrame, q: org.apache.hadoop.fs.Path): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(q.getParent, s"_apply_tmp_${q.getName}")
    val old = new org.apache.hadoop.fs.Path(q.getParent, s"_apply_old_${q.getName}")
    fs.delete(tmp, true)
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(q)) require(fs.rename(q, old), s"apply: rename $q failed")
    require(fs.rename(tmp, q), s"apply: rename $tmp -> $q failed")
    fs.delete(old, true)
  }

  private def recoverSnapshot(fs: org.apache.hadoop.fs.FileSystem,
                              q: org.apache.hadoop.fs.Path): Unit = {
    val oldRec = new org.apache.hadoop.fs.Path(q.getParent, s"_apply_old_${q.getName}")
    if (!fs.exists(q) && fs.exists(oldRec))
      require(fs.rename(oldRec, q), s"apply: recovery rename $oldRec -> $q failed")
  }

  /**
   * DELETE-aware streaming changelog apply — [[upsertStream]]'s
   * upsert-only fold generalized to a real change feed
   * ([[applyChangelog]] is the one-shot batch form). Deletes persist
   * as TOMBSTONES (the snapshot keeps the key with its delete op and
   * version): physically removing the row would let a replayed or
   * out-of-order OLDER upsert resurrect it — with the tombstone, the
   * same version-aware fold (winner = higher `orderCols` tuple)
   * covers upserts and deletes uniformly, so the snapshot equals the
   * global fold of the whole stream under ANY micro-batch boundaries
   * or arrival order, and re-running a failed batch is a no-op.
   * Read the live state through [[readChangelogSnapshot]] (filters
   * tombstones). Snapshot schema: (key, valueCol, orderCols..., opCol).
   */
  def changelogStream(updates: DataFrame, snapshotDir: String, key: String,
                      valueCol: String, opCol: String, deleteOp: String,
                      orderCols: Seq[String], checkpointDir: String,
                      trigger: org.apache.spark.sql.streaming.Trigger =
                        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyChangelogBatch(batch, snapshotDir, key, valueCol, opCol, deleteOp, orderCols)
      }
      .start()
  }

  /** One delete-aware apply step (extracted so batch tests and
   *  foreachBatch share the exact code path). */
  def applyChangelogBatch(batch: DataFrame, snapshotDir: String, key: String,
                          valueCol: String, opCol: String, deleteOp: String,
                          orderCols: Seq[String]): Unit = {
    require(orderCols.nonEmpty, "applyChangelogBatch: orderCols must totally order changes")
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val cols = Seq(key, valueCol) ++ orderCols :+ opCol
    // collapse the batch to each key's last change (same row-hash
    // tiebreak rationale as applyBatch)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
      .orderBy(orderCols.map(col(_).desc) :+
        xxhash64(struct(batch.columns.map(col): _*)).asc: _*)
    val latest = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).select(cols.map(col): _*)
    val hPath = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val q = fs.makeQualified(hPath)
    recoverSnapshot(fs, q)
    val merged =
      if (!fs.exists(hPath)) latest
      else {
        val base = spark.read.parquet(snapshotDir)
        def bc(c: String) = col(s"__cb.$c")
        def uc(c: String) = col(s"__cu.$c")
        def vtuple(side: String => Column) = struct(orderCols.map(side): _*)
        // version-aware for upserts AND tombstones uniformly
        val updateWins = uc(key).isNotNull &&
          (bc(key).isNull || vtuple(uc) >= vtuple(bc))
        base.alias("__cb")
          .join(latest.alias("__cu"), bc(key) === uc(key), "full_outer")
          .select(cols.map { c =>
            (if (c == key) coalesce(uc(key), bc(key))
             else when(updateWins, uc(c)).otherwise(bc(c))).as(c)
          }: _*)
      }
    atomicSwap(fs, merged, q)
  }

  /** The live state of a [[changelogStream]] snapshot: tombstones
   *  filtered out, op column dropped. */
  def readChangelogSnapshot(spark: org.apache.spark.sql.SparkSession, snapshotDir: String,
                            opCol: String, deleteOp: String): DataFrame =
    spark.read.parquet(snapshotDir).filter(col(opCol) =!= deleteOp).drop(opCol)
}
