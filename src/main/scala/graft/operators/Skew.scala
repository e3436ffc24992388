package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Generalized skew-salted equi-join — the salting trick the spatial
 * cross-match uses for galactic-plane hot pixels
 * ([[Spatial]] crossMatchKnn), extracted for ANY equi-join whose key
 * distribution has hot keys too big for one task and whose build
 * side is too big to broadcast. AQE's skew-join split handles most
 * sort-merge skew at runtime; salting remains the answer when a
 * single key's rows exceed what ANY one task may hold (AQE splits
 * files, not the hash space of an aggregation-style join) or when
 * the join must stay a shuffled hash join.
 *
 * Shape: the LEFT (big, skewed) side gets a deterministic per-row
 * salt in [0, salts); the RIGHT side is replicated once per salt
 * value (bounded blow-up: |right| x salts — keep the right side the
 * smaller input). The join key becomes (key, salt): a hot key's rows
 * now spread over `salts` reducers. Row-level results are IDENTICAL
 * to the unsalted join (every left row still meets every matching
 * right row exactly once — it meets the one replica carrying its own
 * salt), which the oracle-gated q_skewjoin hash-verifies.
 */
object Skew {

  /**
   * Inner/left-outer salted equi-join on `leftKey === rightKey`.
   * NULL keys follow SQL semantics (never match; preserved by
   * left_outer). Columns of both inputs survive (right's key column
   * included), like a plain `.join(right, l === r, joinType)`.
   */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"saltedJoin: salts must be >= 1, got $salts")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin: only inner/left_outer (right replication breaks right-side semantics), got $joinType")
    // deterministic per-row salt: hash EVERY left column so two
    // identical rows may still land on different... no — identical
    // rows MUST be deterministic too; xxhash64 over the full row is
    // deterministic per row CONTENT, spreading a hot key as long as
    // its rows differ anywhere. (A hot key of fully identical rows
    // cannot be spread deterministically — monotonically-increasing
    // ingest ids make that case vanish in practice.)
    val saltCol = pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salts.toLong))
    val l = left.withColumn("__salt", saltCol)
    val r = right.crossJoin(
      spark(right).range(0, salts).select(col("id").as("__salt")))
    l.join(r, l("__salt") === r("__salt") && col(leftKey) === col(rightKey), joinType)
      .drop("__salt")
  }

  private def spark(df: DataFrame) = df.sparkSession
}
