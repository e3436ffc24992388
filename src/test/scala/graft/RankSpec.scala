package graft

import graft.operators.Rank
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class RankSpec extends SparkSpecBase {
  import spark.implicits._

  test("globalRowNumber matches the single-task window across partitionings and counts") {
    val rnd = new scala.util.Random(17)
    val data = (1 to 5000).map(i => (i.toLong, rnd.nextInt(1000)))
    val df = data.toDF("id", "score")
    val expect = df.withColumn("rank",
        row_number().over(Window.orderBy("score", "id")).cast("long"))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    for (parts <- Seq(1, 7); inputParts <- Seq(3, 32)) {
      val got = Rank.globalRowNumber(df.repartition(inputParts),
          Seq(col("score"), col("id")), numPartitions = parts)
        .select("id", "rank").as[(Long, Long)].collect().toMap
      assert(got == expect, s"parts=$parts inputParts=$inputParts")
    }
  }

  test("globalRowNumber plan has a range exchange, never a single-task global sort window") {
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "score")
    val ranked = Rank.globalRowNumber(df, Seq(col("score"), col("id")), numPartitions = 8)
    // every partition holds a contiguous, sorted rank range
    val perPart = ranked.rdd.mapPartitionsWithIndex { case (i, it) =>
      val rs = it.map(_.getLong(2)).toSeq
      Iterator.single((i, rs))
    }.collect().filter(_._2.nonEmpty).sortBy(_._1)
    perPart.foreach { case (_, rs) =>
      assert(rs == (rs.head to rs.last), "ranks within a partition are contiguous+sorted")
    }
    val bounds = perPart.map { case (i, rs) => (i, rs.head, rs.last) }
    bounds.sliding(2).foreach {
      case Array((_, _, hi), (_, lo2, _)) => assert(hi + 1 == lo2, "partition ranges chain")
      case _ =>
    }
    assert(bounds.head._2 == 1L && bounds.last._3 == 100L)
    assert(perPart.length > 1, "the sort must actually be distributed")
  }

  test("kthSmallest: exact on duplicate-heavy, negative and wide-range multisets") {
    val rnd = new scala.util.Random(31)
    val data: Seq[Long] =
      Seq.fill(500)(rnd.nextInt(20).toLong) ++          // heavy duplicates
      Seq.fill(300)(-rnd.nextInt(1000).toLong) ++       // negatives
      Seq.fill(200)(rnd.nextLong() % (1L << 60)) ++     // wide range
      Seq(Long.MinValue / 4, Long.MaxValue / 4)         // extremes within the range guard
    val sorted = data.sorted
    val df = data.map(Tuple1(_)).toDF("v").repartition(7)
    val ks = Seq(1L, 2L, 77L, data.size / 2L, data.size - 1L, data.size.toLong)
    val got = graft.operators.Rank.kthSmallest(df, "v", ks)
    ks.foreach { k =>
      assert(got(k) == sorted((k - 1).toInt), s"k=$k: got ${got(k)}, want ${sorted((k - 1).toInt)}")
    }
    // nulls excluded, guards loud
    val withNulls = (data.map(Option(_)) ++ Seq.fill(50)(Option.empty[Long])).toDF("v")
    assert(graft.operators.Rank.kthSmallest(withNulls, "v", Seq(1L))(1L) == sorted.head)
    assert(intercept[IllegalArgumentException](
      graft.operators.Rank.kthSmallest(df, "v", Seq(0L))).getMessage.contains("outside"))
    assert(intercept[IllegalArgumentException](
      graft.operators.Rank.kthSmallest(df, "v", Seq(data.size + 1L))).getMessage.contains("outside"))
    assert(intercept[IllegalArgumentException](
      graft.operators.Rank.kthSmallest(
        Seq(Long.MinValue, Long.MaxValue).map(Tuple1(_)).toDF("v"), "v", Seq(1L)))
      .getMessage.contains("2^63"))
  }

  test("curriculum reproduces exact ntile semantics including the n < phases edge") {
    val df = (1 to 103).map(i => ((i * 37 % 103).toLong, i.toLong)).toDF("score", "id")
    for (k <- Seq(1, 4, 5, 103, 200)) {
      val got = Rank.curriculum(df, Seq(col("score"), col("id")), k)
        .select("id", "phase").as[(Long, Long)].collect().toMap
      val expect = df.withColumn("phase",
          ntile(k).over(Window.orderBy("score", "id")).cast("long"))
        .select("id", "phase").as[(Long, Long)].collect().toMap
      assert(got == expect, s"phases=$k")
    }
    assert(intercept[IllegalArgumentException](
      Rank.curriculum(df, Seq(col("score")), 0)).getMessage.contains("phases >= 1"))
  }

  test("quantileNormalize: identity on one group, distribution-equal groups align, max->max") {
    // single group: ranks r of n map to k = ceil(r*N/n) = r -> identity
    val one = (1 to 50).map(i => ("g", (i * 17 % 50).toLong, i.toLong)).toDF("src", "v", "id")
    val idt = Rank.quantileNormalize(one, "src", "v", "id")
      .select("v", "qnorm").as[(Long, Long)].collect()
    assert(idt.forall(r => r._1 == r._2), "one group must map onto itself")
    // two groups, same shape but shifted values: both map onto the SAME
    // pooled quantile sequence, and each group's max hits the pooled max
    val two = ((1 to 30).map(i => ("a", i.toLong, i.toLong)) ++
      (1 to 30).map(i => ("b", i + 1000L, 100L + i))).toDF("src", "v", "id")
    val out = Rank.quantileNormalize(two, "src", "v", "id")
      .select("src", "qnorm").as[(String, Long)].collect()
    val byGrp = out.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).sorted.toSeq }
    assert(byGrp("a") == byGrp("b"), "equal-shaped groups must normalize identically")
    assert(byGrp("a").last == 1030L, "the group maximum maps to the pooled maximum")
  }

  test("prefixSums matches the single-task window across partitionings, multi-column") {
    val df = (1 to 500).map(i => ((i * 61 % 499).toLong, (i % 7).toLong, (i % 3).toLong))
      .toDF("k", "a", "b")
    val expect = df.withColumn("cum_a", sum("a").over(
        Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_b", sum("b").over(
        Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "cum_a", "cum_b").as[(Long, Long, Long)].collect().toSet
    for (parts <- Seq(1, 4, 13)) {
      val got = Rank.prefixSums(df.repartition(parts), Seq(col("k")), Seq("a", "b"))
        .select("k", "cum_a", "cum_b").as[(Long, Long, Long)].collect().toSet
      assert(got == expect, s"input partitions=$parts")
    }
    // descending order: running totals walk the other way
    val desc = Rank.prefixSums(df, Seq(col("k").desc), Seq("a"))
      .select("k", "cum_a").as[(Long, Long)].collect()
    val total = (1 to 500).map(_ % 7).sum.toLong
    assert(desc.minBy(_._1)._2 == total, "the lowest key carries the full descending total")
    assert(intercept[IllegalArgumentException](
      Rank.prefixSums(df, Seq(col("k")), Seq())).getMessage.contains("at least one"))
  }

  test("prefixSums rejects nulls in a sum column with a named error, not an NPE") {
    val df = Seq((1L, Some(2L)), (2L, None), (3L, Some(4L)))
      .toDF("k", "a")
    val e = intercept[org.apache.spark.SparkException](
      Rank.prefixSums(df, Seq(col("k")), Seq("a")).collect())
    assert(e.getMessage.contains("null in sum column 'a'"),
      s"the task error must name the offending column: ${e.getMessage}")
  }

  test("quantileNormalize guards the rank*N int64 bound at exactly floor(sqrt(2^63-1))") {
    Rank.requireQnormBound(3037000499L) // the largest safe N passes
    val e = intercept[IllegalArgumentException](Rank.requireQnormBound(3037000500L))
    assert(e.getMessage.contains("overflow int64"), e.getMessage)
    // the bound itself is right: N^2 fits at the limit, not one past it
    assert(BigInt(3037000499L).pow(2) <= BigInt(Long.MaxValue))
    assert(BigInt(3037000500L).pow(2) > BigInt(Long.MaxValue))
  }
}
