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
                 salts: Int, joinType: String = "inner",
                 saltCols: Seq[String] = Nil): DataFrame = {
    require(salts >= 1, s"saltedJoin: salts must be >= 1, got $salts")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin: only inner/left_outer (right replication breaks right-side semantics), got $joinType")
    saltCols.foreach(c => require(left.columns.contains(c),
      s"saltedJoin: saltCols column '$c' not in the left frame (${left.columns.mkString(", ")})"))
    // deterministic per-row salt: hash row CONTENT (xxhash64), never
    // rand() — retried map tasks must reproduce the same salt or rows
    // duplicate/vanish under fetch failures (SPARK-38388). Default
    // hashes EVERY left column, spreading a hot key as long as its
    // rows differ anywhere; callers that consume only a projection
    // should pass those columns as `saltCols` — the salt expression
    // otherwise references the full row and silently defeats column
    // pruning at the scan AND widens the salted exchange to every
    // column (a hot key of fully identical rows cannot be spread
    // deterministically either way). The join result is
    // salt-invariant, so saltCols only affects spread and plan width.
    val saltInputs = if (saltCols.nonEmpty) saltCols else left.columns.toSeq
    val saltCol = pmod(xxhash64(struct(saltInputs.map(col): _*)), lit(salts.toLong))
    val l = left.withColumn("__salt", saltCol)
    val r = right.crossJoin(
      spark(right).range(0, salts).select(col("id").as("__salt")))
    // SHUFFLE_HASH on the replicated side: salting exists precisely
    // because the right side is too big (or too hot) to broadcast —
    // without the hint the planner broadcasts the salts-times-larger
    // replication whenever its ESTIMATE fits, serializing a
    // single-threaded driver hash build of salts x |right| rows and
    // defeating the (salt, key) redistribution the operator is for.
    // The hashed build is a per-partition slice, and AQE's skew-join
    // splitting applies to shuffled-hash joins.
    l.join(r.hint("SHUFFLE_HASH"),
        l("__salt") === r("__salt") && col(leftKey) === col(rightKey), joinType)
      .drop("__salt")
  }

  private def spark(df: DataFrame) = df.sparkSession
}
