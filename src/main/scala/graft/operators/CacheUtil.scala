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
 *  - a `*WithHandle`/`*WithCache` variant returning `() => Unit` →
 *    "handle" — the REQUIRED shape when the columnar in-memory scan
 *    or the planner's size statistics are load-bearing (measured:
 *    prefixFilterJoin 5-7x and triangleCounts ~3x slower when their
 *    caches were converted to lineage-cut checkpoints — downstream
 *    joins lost their broadcast decisions and columnar pruning);
 *  - [[CacheUtil.gcPersist]] → lifetime tied to the returned frame;
 *    for SLIM frames (a few fixed-width columns) whose consumers
 *    don't depend on cache statistics.
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

  /** Eagerly-materialized cache whose lifetime is the returned frame
   *  (see object doc): `localCheckpoint` stores the INTERNAL row
   *  representation (columnar-friendly serialized batches — a
   *  `df.rdd.persist` round-trip would deserialize every row into
   *  external Row objects, measured 5x slower on the wide
   *  token-array frame of prefixFilterJoin), keeps the blocks out of
   *  the CacheManager, and cuts the logical plan so multi-consumer
   *  reuse never re-analyzes the upstream subtree. Blocks free via
   *  the ContextCleaner once the caller drops the result. */
  def gcPersist(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)
}
