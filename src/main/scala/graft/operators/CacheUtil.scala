package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Cache-lifetime conventions for operators that materialize an
 * intermediate consumed more than once by the RETURNED plan — the
 * case where neither an in-function unpersist (the result still
 * needs the blocks at the caller's action) nor a caller-visible
 * handle (`*WithHandle` — the right shape when the CALLER owns the
 * lifetime, e.g. a signature table reused across corpora) fits.
 *
 * The grep-able convention (r13 verdict item 8):
 *  - paired `persist`/`unpersist` inside one function → "released";
 *  - a `*WithHandle` variant returning `() => Unit` → "handle";
 *  - [[CacheUtil.gcPersist]] → lifetime tied to the returned frame.
 *
 * Why RDD-level persist: `Dataset.persist` registers the plan in the
 * session's CacheManager, which holds a STRONG reference until an
 * explicit unpersist or a session-wide clearCache — a library caller
 * running many operators would accumulate executor storage without
 * bound (the bench harness only masked this by clearing the cache
 * between queries). An RDD persist stays out of the CacheManager and
 * is tracked by the ContextCleaner through a weak reference: the
 * blocks free themselves once the caller drops the last reference to
 * the result. CacheHygieneSpec pins both halves (no CacheManager
 * entry; blocks drain after GC).
 */
private[graft] object CacheUtil {

  /** Materialize-on-first-use cache whose lifetime is the returned
   *  frame (see object doc). The RDD boundary also cuts the logical
   *  plan, so multi-consumer reuse never re-analyzes the upstream
   *  subtree. */
  def gcPersist(df: DataFrame): DataFrame = {
    val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    df.sparkSession.createDataFrame(rdd, df.schema)
  }
}
