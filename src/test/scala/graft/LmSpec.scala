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

  test("DSIR importance weights: target-like docs weigh 1, source-like docs decay, sample is monotone") {
    import graft.operators.Sampling
    // target: "alpha beta" language; source: "gamma delta" language
    val tgt = Lm.trainBigram(Seq((1L, "alpha beta alpha beta alpha beta")).toDF("doc_id", "text"), "doc_id", "text")
    val src = Lm.trainBigram(Seq((2L, "gamma delta gamma delta gamma delta")).toDF("doc_id", "text"), "doc_id", "text")
    val docs = Seq(
      (10L, "alpha beta alpha beta"), // target-like: p_tgt >> p_src
      // source-like, long enough that the per-bigram ratio compounds
      // to a vanishing weight (tiny vocab V=2 keeps the per-step
      // unseen penalty at only 1/2)
      (11L, Array.fill(8)("gamma delta").mkString(" ")),
      (12L, "alpha beta gamma delta")). // mixed
      toDF("doc_id", "text")
    val w = Lm.importanceWeights(docs, "doc_id", "text", tgt, src)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(w(10L) == 1.0, s"target-like doc must clamp to weight 1 (got ${w(10L)})")
    assert(w(11L) < 0.01, s"source-like doc must get a vanishing weight (got ${w(11L)})")
    assert(w(11L) < w(12L) && w(12L) <= 1.0, "mixed doc sits between the extremes")
    // the sample keeps exactly the docs whose weight clears their id hash draw
    val kept = Lm.importanceSample(docs, "doc_id", "text", tgt, src)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(10L), "weight-1 docs are always kept")
    val wdf = Lm.importanceWeights(docs, "doc_id", "text", tgt, src)
    val expect = Sampling.weightedSample(wdf, "doc_id", "weight")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == expect, "importanceSample == weightedSample over importanceWeights")
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

  test("Kneser-Ney matches the hand-computed interpolated formula on a tiny corpus") {
    // training bigrams: (a,b) c12=2, (a,c) 1, (b,a) 1 ->
    //   ctx: a (c1=3, n1f=2), b (c1=1, n1f=1)
    //   bwd: b n1b=1, c n1b=1, a n1b=1;  nall=3, v=3 (b, c, a)
    val ref = Seq((1L, "a b a c"), (2L, "a b")).toDF("doc_id", "text")
    // bigrams of ref: doc1 -> (a,b),(b,a),(a,c); doc2 -> (a,b)
    val lm = Lm.trainKneserNey(ref, "doc_id", "text")
    val d = 0.75
    def pc(n1b: Long) = (n1b + 1.0) / (3 + 3 + 1.0)
    // score doc "a b x": bigrams (a,b) seen, (b,x) seen-w1 unseen-w2
    val pAB = (math.max(2 - d, 0) + d * 2 * pc(1)) / 3.0
    val pBX = (math.max(0 - d, 0) + d * 1 * pc(0)) / 1.0
    val expect = BigDecimal(-(math.log(pAB) + math.log(pBX)) / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Lm.crossEntropyKn(Seq((9L, "a b x")).toDF("doc_id", "text"), "doc_id", "text", lm)
      .select("cross_entropy").as[Double].head()
    assert(math.abs(got - expect) < 1e-9, s"got $got, expected $expect")
    // unseen w1 falls back to the continuation distribution alone
    val pXA = pc(1)
    val gotU = Lm.crossEntropyKn(Seq((9L, "x a")).toDF("doc_id", "text"), "doc_id", "text", lm)
      .select("cross_entropy").as[Double].head()
    assert(math.abs(gotU - BigDecimal(-math.log(pXA)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"unseen-context fallback: $gotU")
  }

  test("Kneser-Ney separates reference-like text from tail noise more sharply than add-one") {
    val ref = (0L until 40L).map(i => (i, "the quick brown fox jumps over the lazy dog again"))
      .toDF("doc_id", "text")
    val docs = Seq((100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "zq xw vv kk pp qq rr ss tt uu")).toDF("doc_id", "text")
    val kn = Lm.crossEntropyKn(docs, "doc_id", "text", Lm.trainKneserNey(ref, "doc_id", "text"))
      .select("doc_id", "cross_entropy").as[(Long, Double)].collect().toMap
    assert(kn(100L) < kn(101L), s"reference-like must score lower: $kn")
  }

  test("degenerate reference slice (no bigrams, v=0) fails loudly instead of scoring Infinity") {
    // every ref doc has < 2 tokens -> zero bigrams -> vocab v = 0
    val ref = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    val docs = Seq((10L, "a b c")).toDF("doc_id", "text")
    val lm = Lm.trainBigram(ref, "doc_id", "text")
    val e = intercept[Exception] {
      Lm.crossEntropy(docs, "doc_id", "text", lm).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("Lm.crossEntropy")),
      s"expected the operator-named vocab guard, got: ${messages(e).mkString(" | ")}")
  }
}
