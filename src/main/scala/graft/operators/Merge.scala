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
}
