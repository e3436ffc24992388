package graft

import graft.operators.Outliers
import org.apache.spark.sql.functions._

/** Modified-z (median/MAD) robust outlier detection. */
class OutliersSpec extends SparkSpecBase {
  import spark.implicits._

  private def df(rows: (String, Long, Long)*) = rows.toDF("g", "id", "v")

  test("flags planted spikes, not the bulk; z matches the hand formula") {
    // bulk: v in 100..119; with the spike in the sample (21 values)
    // the median is 110 (u: 220) and the MAD is 5 (mad4: 20)
    val bulk = (0 until 20).map(i => ("a", i.toLong, 100L + i))
    val out = Outliers.robustOutliers(df(bulk :+ (("a", 99L, 1000L)): _*), "g", "id", "v")
      .select("id", "z_e4").as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(99L), s"only the spike should flag: $out")
    // z = 1.349 * d / mad4 with d = |2000 - 220| = 1780:
    // (1780 * 13490) div 20 = 1200610, i.e. z = 120.0610
    assert(out(99L) == 1200610L, s"z_e4 must be the exact integer-division score: $out")
  }

  test("robust to 40% contamination where mean/stddev z-scores break down") {
    // 12 inliers at ~50, 8 wild values: classic z would inflate sigma
    val inliers = (0 until 12).map(i => ("a", i.toLong, 50L + (i % 3)))
    val wild = (0 until 8).map(i => ("a", 100L + i, 5000L + 100L * i))
    val flagged = Outliers.robustOutliers(df(inliers ++ wild: _*), "g", "id", "v")
      .select("id").as[Long].collect().toSet
    assert(flagged == (100L until 108L).toSet,
      s"all 8 wild values must flag despite 40% contamination: $flagged")
  }

  test("MAD = 0 groups emit nothing; stats report the degeneracy; per-group isolation") {
    val const = (0 until 10).map(i => ("const", i.toLong, 7L))
    val normal = (0 until 10).map(i => ("norm", 50L + i, 10L + i)) :+ (("norm", 99L, 900L))
    val stats = Outliers.robustStats(df(const ++ normal: _*), "g", "v")
      .select("grp", "mad4").as[(String, Long)].collect().toMap
    assert(stats("const") == 0L, s"constant group must report mad4 = 0: $stats")
    val out = Outliers.robustOutliers(df(const ++ normal: _*), "g", "id", "v")
      .select("grp", "id").as[(String, Long)].collect()
    assert(out.forall(_._1 == "norm"), s"MAD-0 group must emit nothing: ${out.toSeq}")
    assert(out.map(_._2).toSet == Set(99L), s"norm group flags only its spike: ${out.toSeq}")
  }

  test("guards: non-integral values and bad thresholds fail loudly") {
    val bad = Seq(("g", 1L, 1.5)).toDF("g", "id", "v")
    assert(intercept[IllegalArgumentException](
      Outliers.robustOutliers(bad, "g", "id", "v")).getMessage.contains("integral"))
    assert(intercept[IllegalArgumentException](
      Outliers.robustOutliers(df(("g", 1L, 1L)), "g", "id", "v", zThresholdE4 = 0))
      .getMessage.contains("positive"))
  }

  test("winsorize clips to exact per-group percentiles, keeps nulls null, guards p-range") {
    // group a: 1..100 (p10 = 10.9 -> 11, p90 = 90.1 -> 90); group b untouched range
    val rows = (1 to 100).map(i => ("a", i.toLong)) ++ Seq(("b", 5L), ("b", 6L), ("b", 7L))
    val withNull = rows.map { case (g, v) => (g, Option(v)) } :+ (("a", Option.empty[Long]))
    val out = graft.operators.Outliers.winsorize(
        withNull.toDF("g", "v"), "g", "v", 0.10, 0.90)
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    val aClipped = out.filter(_._1 == "a").flatMap(_._3)
    assert(aClipped.min == 11L && aClipped.max == 90L,
      s"tails clamp to rounded exact percentiles: min=${aClipped.min} max=${aClipped.max}")
    assert(out.filter(_._1 == "a").flatMap(_._2).filter(v => v >= 11 && v <= 90).toSet ==
      out.filter(_._1 == "a").filter(_._2.exists(v => v >= 11 && v <= 90)).flatMap(_._3).toSet,
      "in-range values pass through unchanged")
    assert(out.exists(r => r._1 == "a" && r._2.isEmpty && r._3.isEmpty), "null stays null")
    assert(intercept[IllegalArgumentException](
      graft.operators.Outliers.winsorize(withNull.toDF("g", "v"), "g", "v", 0.9, 0.1))
      .getMessage.contains("pLo < pHi"))
  }
}
