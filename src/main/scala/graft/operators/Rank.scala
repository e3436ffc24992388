package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed global ordering operators. Spark's
 * `row_number().over(Window.orderBy(...))` with no partitionBy
 * collapses the whole dataset into ONE task — the classic Spark
 * scale-killer (the r6 ANN audit found and removed exactly this
 * shape from the top-k paths). These operators compute the same
 * total-order results with a RANGE exchange instead: every partition
 * sorts locally, partition row-counts (one long per partition) are
 * the only thing collected, and each row's global position is its
 * partition offset + local index. 100 TB sorts at full parallelism.
 */
object Rank {

  /**
   * Global row_number (1-based) by `sortCols` — ties must be broken
   * by the caller (include a unique id as the last sort column, or
   * the assignment between equal keys is partitioning-dependent).
   * Plan: one range Exchange + local sorts + a partition-count
   * collect (numPartitions longs) + a map-only index pass. Output:
   * input columns + `rank`.
   */
  /** Core: ranked frame + total row count (the count is free — it is
   *  the sum of the partition sizes the offset walk already
   *  collected). The range-exchange shuffle files are reused between
   *  the size job and the caller's action, so the input is scanned
   *  once and sorted once. */
  private def rankedWithCount(df: DataFrame, sortCols: Seq[Column],
                              numPartitions: Int): (DataFrame, Long) = {
    require(sortCols.nonEmpty, "globalRowNumber needs at least one sort column")
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    // RDD face for the per-partition offset walk: the range exchange
    // + sort stay in the SQL plan above; from here it is one bounded
    // size job (numPartitions longs to the driver) + a map-only zip
    val rdd = ranged.rdd
    val sizes = rdd.mapPartitionsWithIndex { case (i, it) =>
      Iterator.single(i -> it.size.toLong)
    }.collect().sortBy(_._1).map(_._2)
    val offsets = sizes.scanLeft(1L)(_ + _) // 1-based
    val withRank = rdd.mapPartitionsWithIndex { case (i, it) =>
      var r = offsets(i)
      it.map { row =>
        val out = org.apache.spark.sql.Row.fromSeq(row.toSeq :+ r)
        r += 1
        out
      }
    }
    val out = spark.createDataFrame(withRank,
      ranged.schema.add("rank", org.apache.spark.sql.types.LongType, nullable = false))
    (out, sizes.sum)
  }

  /**
   * Global row_number (1-based) by `sortCols` — ties must be broken
   * by the caller (include a unique id as the last sort column, or
   * the assignment between equal keys is partitioning-dependent).
   * Plan: one range Exchange + local sorts + a partition-size
   * collect (numPartitions longs) + a map-only index pass. Output:
   * input columns + `rank`.
   */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
                      numPartitions: Int = 0): DataFrame =
    rankedWithCount(df, sortCols, numPartitions)._1

  /**
   * Curriculum phase assignment: global rank by `scoreCols` (easy ->
   * hard), split into `phases` contiguous blocks with exact ntile
   * semantics (the first `n % phases` blocks get the extra row).
   * Output: input + rank + phase (1-based). The SQL twin is
   * `ntile(phases) OVER (ORDER BY ...)` — same arithmetic, computed
   * here without the single-task window.
   */
  def curriculum(df: DataFrame, scoreCols: Seq[Column], phases: Int): DataFrame = {
    require(phases >= 1, s"curriculum needs phases >= 1, got $phases")
    val (ranked, n) = rankedWithCount(df, scoreCols, 0)
    val q = n / phases
    val r = n % phases
    // integer `div` only (Column./ is double division, which loses
    // exactness past 2^53 — ranks at 100 TB get close)
    val phase =
      if (q == 0) col("rank") // n < phases: tile == rank
      else when(col("rank") <= lit(r * (q + 1)),
          expr(s"(rank - 1) div ${q + 1}") + 1)
        .otherwise(lit(r) + expr(s"(rank - ${r * (q + 1)} - 1) div $q") + 1)
    ranked.withColumn("phase", phase.cast("long"))
  }
}
