package graft

import graft.operators.Lm
import org.apache.spark.sql.functions._

class LmSpec extends SparkSpecBase {
  import spark.implicits._

  test("bigram LM: smoothed conditional normalizes and scores match hand computation") {
    // train: "a b a b a c" -> bigrams (a,b)x2 (b,a)x2 (a,c)x1
    // ctx: a=3, b=2 ; vocab V = |{b, a, c}| = 3
    val ref = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val lm = Lm.trainBigram(ref, "doc_id", "text")
    val bi = lm.bi.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bi == Map(("a", "b") -> 2L, ("b", "a") -> 2L, ("a", "c") -> 1L))
    val ctx = lm.ctx.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ctx == Map("a" -> 3L, "b" -> 2L))
    assert(lm.vocab.as[Long].head() == 3L)

    // p(b|a) = (2+1)/(3+3), p(c|a) = (1+1)/6, p(a|b) = (2+1)/(2+3),
    // unseen pair with seen ctx: p(a|a) = 1/6 ; unseen ctx: p(x|z) = 1/3
    val docs = Seq(
      (10L, "a b"),          // one bigram, seen
      (11L, "a a"),          // unseen pair, seen context
      (12L, "z x"),          // unseen context entirely
      (13L, "solo"),         // < 2 tokens: no row
      (14L, "a b a c")).toDF("doc_id", "text")
    val out = Lm.crossEntropy(docs, "doc_id", "text", lm).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!out.contains(13L), "sub-bigram docs emit no row")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(10L) == ((1L, r6(-math.log(3.0 / 6)))))
    assert(out(11L) == ((1L, r6(-math.log(1.0 / 6)))))
    assert(out(12L) == ((1L, r6(-math.log(1.0 / 3)))))
    val ce14 = -(math.log(3.0 / 6) + math.log(3.0 / 5) + math.log(2.0 / 6)) / 3
    assert(out(14L) == ((3L, r6(ce14))))
  }

  test("model joins broadcast; corpus never shuffles before the doc aggregate") {
    val ref = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val docs = (0L until 50L).map(i => (i, s"the quick fox number $i runs")).toDF("doc_id", "text")
    val plan = Lm.crossEntropy(docs, "doc_id", "text", Lm.trainBigram(ref, "doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"model joins must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-side bigrams must not shuffle into a merge join:\n$plan")
  }
}
