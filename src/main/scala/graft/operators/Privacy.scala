package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Privacy-preserving release operators for training-data pipelines
 * (reference has no analog — LLM-pipeline surface).
 */
object Privacy {

  /**
   * k-anonymity via generalization-ladder ascent (Sweeney 2002, local
   * recoding): `levels` is a ladder of quasi-identifier (QI) mappings
   * for the same named QI tuple, finest first — e.g.
   * (city, segment) -> (region, segment) -> ('*', segment) -> ('*','*').
   * Level-i group sizes are counted over the NOT-YET-RELEASED residue
   * (rows whose finer groups all fell short of k), not the whole
   * input: a row released at level i therefore shares its released
   * (level, QI tuple) with at least k-1 OTHER released rows, so the
   * released table itself is k-anonymous. (Counting every level over
   * the whole input — the r11 shape — let a lone city2 row "borrow"
   * company from city1 rows that released at the finer level and come
   * out uniquely identifiable; the r11 ADVICE pass caught it.) A row
   * no level can release (only possible when the coarsest level is
   * not a constant tuple or the table itself is smaller than k) is
   * emitted fully suppressed with `anon_level = -1` and NULL QI
   * values. QI expressions must be non-null (null grouping keys would
   * not survive the count back-join).
   *
   * Output: (idCol, QI columns..., anon_level, group_n) — `group_n`
   * is the size of the row's released equivalence class (>= k by
   * construction; NULL for suppressed rows).
   *
   * Scale shape: one map-side-combined groupBy per level produces a
   * |distinct QI|-sized count table, explicitly broadcast back — the
   * fact table never shuffles. The residue chain makes the level-i
   * count depend on levels < i, so the plan re-derives the (rapidly
   * shrinking) residue from the base scan per level: L broadcast-join
   * map passes over the base for L ladder levels — L is 3–5 by
   * construction, and each pass after the first filters with already-
   * built broadcasts, so this stays scan-bound, never shuffle-bound.
   */
  def kAnonymize(df: DataFrame, idCol: String, k: Int,
                 levels: Seq[Seq[(String, Column)]]): DataFrame = {
    require(k >= 1, s"kAnonymize: k must be >= 1 (got $k)")
    require(levels.nonEmpty, "kAnonymize: at least one generalization level")
    val names = levels.head.map(_._1)
    require(levels.forall(_.map(_._1) == names),
      "kAnonymize: every level must define the same QI column names in the same order")
    var cur = df
    for ((lvl, i) <- levels.zipWithIndex; (nm, c) <- lvl)
      cur = cur.withColumn(s"__l${i}_$nm", c)
    // pin each rung's residue (slim: id + QI columns) — every rung's
    // class-count aggregate AND its broadcast join read the SAME
    // residue, and rung i's residue derives from rung i-1's, so an
    // unpinned chain re-executes the whole prefix once per rung
    // (quadratic re-execution, the r14 q_ldiversity weak item). The
    // gcPersist lifetime rides the returned union plan, which
    // references every rung's blocks.
    var residue = CacheUtil.gcPersist(cur.select(col(idCol) +:
      levels.indices.flatMap(i => names.map(nm => col(s"__l${i}_$nm"))): _*))
    val qiType = names.map(nm => nm -> residue.schema(s"__l0_$nm").dataType).toMap
    val released = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (i <- levels.indices) {
      val keys = names.map(nm => s"__l${i}_$nm")
      val cnt = residue.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      val j = residue.join(broadcast(cnt), keys)
      released += j.filter(col("__n") >= k)
        .select(col(idCol) +: names.map(nm => col(s"__l${i}_$nm").as(nm)) :+
          lit(i).as("anon_level") :+ col("__n").as("group_n"): _*)
      val next = j.filter(col("__n") < k).drop("__n")
      residue = if (i == levels.length - 1) next else CacheUtil.gcPersist(next)
    }
    val suppressed = residue.select(col(idCol) +:
      names.map(nm => lit(null).cast(qiType(nm)).as(nm)) :+
      lit(-1).as("anon_level") :+ lit(null).cast("long").as("group_n"): _*)
    (released :+ suppressed).reduce(_ unionByName _)
  }

  /**
   * l-diversity audit of a released table (Machanavajjhala et al.
   * 2007, distinct-l): k-anonymity bounds re-identification but not
   * ATTRIBUTE disclosure — if every record of an equivalence class
   * shares one sensitive value, membership alone reveals it. For each
   * released class (the `classCols` tuple — for a [[kAnonymize]]
   * release: the QI columns plus `anon_level`), reports its size, its
   * distinct sensitive-value count, and whether it meets distinct
   * l-diversity (>= `l` distinct sensitive values). The release is
   * publishable only when every class flags true.
   *
   * Scale shape: ONE map-side-combined groupBy over the released
   * table (count + count-distinct per class) — class count is bounded
   * by the generalization domains, rows never collect.
   */
  def lDiversity(released: DataFrame, classCols: Seq[String], sensitiveCol: String,
                 l: Int): DataFrame = {
    require(l >= 1, s"lDiversity: l must be >= 1 (got $l)")
    require(classCols.nonEmpty, "lDiversity: at least one class column")
    released.groupBy(classCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("l_diverse", col("n_sensitive") >= l)
  }

  /**
   * t-closeness audit of a released table (Li, Li & Venkatasubramanian
   * 2007) — the third rung of the release-gate ladder after
   * [[kAnonymize]] and [[lDiversity]]: distinct-l is provably
   * insufficient against SKEWED sensitive distributions (a class with
   * l distinct values, 98% of them one value, still discloses that
   * value with near-certainty). Per released class, measures the
   * VARIATIONAL DISTANCE between the class's categorical
   * sensitive-value distribution P and the whole released table's Q:
   * d(P, Q) = (1/2) * sum_v |P(v) - Q(v)|, and flags classes with
   * d <= t. Exact integer rationals throughout: with class counts c_v
   * (size n) and global counts g_v (size N),
   * d = sum_v |c_v*N - g_v*n| / (2*n*N), so the flag compares
   * num * tDen <= 2*n*N * tNum with t = tNum/tDen — no float enters
   * the decision (the reported `t_dist` double is 6-dp display only).
   *
   * Scale shape: two map-side-combined rollups over the released
   * table ((class, v) and per-v counts) joined on a dense class x
   * global-support grid — both sides bounded by |classes| x |sensitive
   * domain|, never row count; absent (class, v) cells contribute
   * their full g_v*n mass via the left join's coalesce (dropping them
   * would understate skew exactly where it matters).
   */
  def tCloseness(released: DataFrame, classCols: Seq[String], sensitiveCol: String,
                 tNum: Long, tDen: Long): DataFrame = {
    require(tDen >= 1 && tNum >= 0, s"tCloseness: t = $tNum/$tDen must be a nonneg rational")
    require(classCols.nonEmpty, "tCloseness: at least one class column")
    val cls = released.groupBy(classCols.map(col): _*).agg(count(lit(1)).as("n"))
    val gv = released.groupBy(col(sensitiveCol)).agg(count(lit(1)).as("__g"))
    val tot = released.agg(count(lit(1)).as("__N"))
    val cv = released.groupBy((classCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    cls.crossJoin(broadcast(gv)).crossJoin(broadcast(tot))
      .join(cv, classCols :+ sensitiveCol, "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
      .groupBy(classCols.map(col): _*)
      .agg(min(col("n")).as("n"),
        sum(abs(col("__c") * col("__N") - col("__g") * col("n"))).as("__num"),
        min(col("__N")).as("__NN"))
      .withColumn("t_dist",
        round(col("__num").cast("double") / (lit(2.0) * col("n") * col("__NN")), 6))
      .withColumn("t_close",
        col("__num") * lit(tDen) <= lit(2L) * col("n") * col("__NN") * lit(tNum))
      .drop("__num", "__NN")
  }
}
