package graft

import graft.operators.Classify
import org.apache.spark.sql.functions._

class ClassifySpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spam", "buy cheap pills buy now cheap"),
    (2L, "spam", "cheap pills now buy cheap cheap"),
    (3L, "ham", "meeting notes agenda for the review"),
    (4L, "ham", "review notes for the agenda meeting"),
    (5L, "spam", "now now buy pills"),
    (6L, "ham", "the meeting review agenda")
  ).toDF("id", "label", "text")

  test("nb recovers separable labels and held-out docs follow the vocabulary") {
    val m = Classify.trainNb(corpus, "label", "id", "text")
    val preds = Classify.classifyNb(corpus, "id", "text", m)
      .select("id", "pred_label").as[(Long, String)].collect().toMap
    assert(preds == Map(1L -> "spam", 2L -> "spam", 3L -> "ham",
      4L -> "ham", 5L -> "spam", 6L -> "ham"))
    val held = Seq((10L, "cheap pills"), (11L, "agenda review")).toDF("id", "text")
    val hp = Classify.classifyNb(held, "id", "text", m)
      .select("id", "pred_label").as[(Long, String)].collect().toMap
    assert(hp == Map(10L -> "spam", 11L -> "ham"))
    m.unpersist()
  }

  test("nb scores are partitioning-invariant and empty docs produce no row") {
    val m = Classify.trainNb(corpus, "label", "id", "text")
    val docs = corpus.select("id", "text")
      .union(Seq((99L, "")).toDF("id", "text"))
    val a = Classify.classifyNb(docs, "id", "text", m)
      .orderBy("id").collect().toSeq
    val b = Classify.classifyNb(docs.repartition(7), "id", "text", m)
      .orderBy("id").collect().toSeq
    assert(a == b, "scores must be identical across partitionings")
    assert(!a.exists(_.getLong(0) == 99L), "an empty doc has nothing to score")
    m.unpersist()
  }

  test("nb: empty training slice fails loudly; 6-dp ties break to the largest label") {
    val m = Classify.trainNb(corpus.filter($"id" < 0), "label", "id", "text")
    val e = intercept[Exception] {
      Classify.classifyNb(corpus, "id", "text", m).collect()
    }
    assert(e.getMessage.contains("vocab v=0"), e.getMessage)
    // two labels with IDENTICAL training text -> identical scores for
    // any doc; argmax must deterministically pick the larger label
    val sym = Seq((1L, "b2", "x y z"), (2L, "a1", "x y z")).toDF("id", "label", "text")
    val ms = Classify.trainNb(sym, "label", "id", "text")
    val p = Classify.classifyNb(Seq((7L, "x y")).toDF("id", "text"), "id", "text", ms)
      .select("pred_label").as[String].head()
    assert(p == "b2", s"tie must break to the largest label, got $p")
  }

  // ---------------------------------------------- nearest-centroid

  private def labeled = corpus.withColumn("__y", $"label" === "spam")

  test("centroid separates disjoint-vocabulary classes, in and out of sample") {
    val m = Classify.trainCentroid(labeled, "__y", "id", "text")
    val preds = Classify.classifyCentroid(corpus, "id", "text", m)
      .select("id", "pred_label").as[(Long, String)].collect().toMap
    assert(preds == Map(1L -> "pos", 2L -> "pos", 3L -> "neg",
      4L -> "neg", 5L -> "pos", 6L -> "neg"), preds.toString)
    val held = Seq((10L, "cheap pills"), (11L, "agenda review")).toDF("id", "text")
    val hp = Classify.classifyCentroid(held, "id", "text", m)
      .select("id", "pred_label").as[(Long, String)].collect().toMap
    assert(hp == Map(10L -> "pos", 11L -> "neg"), hp.toString)
  }

  test("centroid decision values are integer-exact: label swap negates delta exactly") {
    val m = Classify.trainCentroid(labeled, "__y", "id", "text")
    val swapped = Classify.trainCentroid(
      labeled.withColumn("__y", !$"__y"), "__y", "id", "text")
    val d = Classify.classifyCentroid(corpus, "id", "text", m)
      .select("id", "delta").as[(Long, Long)].collect().toMap
    val ds = Classify.classifyCentroid(corpus, "id", "text", swapped)
      .select("id", "delta").as[(Long, Long)].collect().toMap
    assert(d.keySet == ds.keySet)
    d.foreach { case (id, v) =>
      assert(ds(id) == -v, s"doc $id: swap must negate exactly (${ds(id)} vs ${-v})") }
    // and partitioning cannot perturb integer sums
    val d7 = Classify.classifyCentroid(corpus.repartition(7), "id", "text", m)
      .select("id", "delta").as[(Long, Long)].collect().toMap
    assert(d7 == d, "deltas must be identical across partitionings")
  }

  test("centroid: single-class training fails loudly; model join broadcasts") {
    val e = intercept[IllegalArgumentException] {
      Classify.trainCentroid(labeled.filter($"__y"), "__y", "id", "text")
    }
    assert(e.getMessage.contains("both classes"), e.getMessage)
    val m = Classify.trainCentroid(labeled, "__y", "id", "text")
    val plan = Classify.classifyCentroid(corpus, "id", "text", m)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dim-bounded model must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no corpus-sized shuffle join:\n$plan")
  }
}
