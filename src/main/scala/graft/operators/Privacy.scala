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
   * Every row is released at the FINEST level whose QI group (group
   * sizes computed per level over the WHOLE input) holds at least `k`
   * rows; a row no level can release (only possible when the coarsest
   * level is not a constant tuple or the table itself is smaller than
   * k) is emitted fully suppressed with `anon_level = -1` and NULL QI
   * values. QI expressions must be non-null (null grouping keys would
   * not survive the count back-join).
   *
   * Output: (idCol, QI columns..., anon_level, group_n).
   *
   * Scale shape: one map-side-combined groupBy per level produces a
   * |distinct QI|-sized count table, explicitly broadcast back onto
   * the fact table — the input never shuffles, the plan is L broadcast
   * hash joins over one scan, and nothing grows with row count but the
   * (small) QI domains.
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
    for (i <- levels.indices) {
      val keys = names.map(nm => s"__l${i}_$nm")
      val cnt = cur.groupBy(keys.map(col): _*).agg(count(lit(1)).as(s"__n$i"))
      cur = cur.join(broadcast(cnt), keys)
    }
    // finest qualifying level: when() without otherwise is null, so the
    // coalesce chain picks the first level whose group reaches k
    val lvlChoice = levels.indices
      .map(i => when(col(s"__n$i") >= k, lit(i))).reduce(coalesce(_, _))
    val chosen = names.map { nm =>
      levels.indices.map(i => when(lvlChoice === i, col(s"__l${i}_$nm")))
        .reduce(coalesce(_, _)).as(nm)
    }
    val groupN = levels.indices.map(i => when(lvlChoice === i, col(s"__n$i")))
      .reduce(coalesce(_, _))
    cur.select(col(idCol) +: chosen :+
      coalesce(lvlChoice, lit(-1)).as("anon_level") :+ groupN.as("group_n"): _*)
  }
}
