package graft

import graft.operators.Cep
import org.apache.spark.sql.functions._

class CepSpec extends SparkSpecBase {
  import spark.implicits._

  private def seqsOf(rows: Seq[(Long, Long, Long, String)]) =
    Cep.eventSequences(rows.toDF("k", "t", "eid", "et"),
      "k", substring(col("et"), 1, 1), Seq("t", "eid"))

  test("eventSequences orders by time then tiebreak, independent of input order") {
    val rows = Seq(
      (1L, 30L, 1L, "purchase"),
      (1L, 10L, 2L, "view"),
      (1L, 20L, 3L, "click"),
      (1L, 20L, 2L, "view"), // same t=20: eid 2 before 3
      (2L, 5L, 1L, "signup"))
    val out = seqsOf(rows).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "vvcp")
    assert(out(2L) == "s")
    // shuffled input -> same sequences
    val out2 = seqsOf(scala.util.Random.shuffle(rows)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2 == out)
  }

  test("patternMatch counts leftmost non-overlapping spans") {
    val seqs = Seq((1L, "vcvpvp"), (2L, "ssss"), (3L, "vp"), (4L, ""))
      .toDF("k", "seq")
    val out = Cep.patternMatch(seqs, "v[cv]*p")
      .select("k", "n_matches", "max_span", "matched_chars")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 4L, 6L)), "vcvp then vp")
    assert(out(2L) == ((0L, 0L, 0L)))
    assert(out(3L) == ((1L, 2L, 2L)))
    assert(out(4L) == ((0L, 0L, 0L)))
  }

  test("q_seqmatch runs on the real events table with matches present") {
    val df = QueryRegistry.all.toMap.apply("q_seqmatch").run(spark, sf("sf0.001"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).sum > 0, "some user has a view->purchase funnel")
    // matched_chars >= n_matches * 2 (every span is at least "vp")
    rows.foreach { r =>
      assert(r.getLong(4) >= r.getLong(2) * 2)
      assert(r.getLong(3) <= r.getLong(1), "span cannot exceed sequence length")
    }
  }
}
