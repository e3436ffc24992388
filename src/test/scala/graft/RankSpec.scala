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
}
