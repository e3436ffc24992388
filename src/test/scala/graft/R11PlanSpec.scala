package graft

/** Plan-shape guards for the round-8 additions. */
class R11PlanSpec extends SparkSpecBase {

  private def planOf(name: String): String =
    QueryRegistry.all.toMap.apply(name).run(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString

  test("q_argmax: struct-max aggregation plans with NO window sort") {
    val plan = planOf("q_argmax")
    assert(!plan.contains("Window"), s"argmax must be an aggregate, not a window:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate node:\n$plan")
  }

  test("q2_mincost: groupwise-min uses exactly ONE window (no aggregate + join-back pair)") {
    val plan = planOf("q2_mincost")
    assert(plan.contains("Window"), s"expected a window min:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"window must partition by part key, never collapse to one task:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"supplier dim must broadcast:\n$plan")
  }

  test("q_seqmatch: one groupBy shuffle builds the sequences — no join, no single partition") {
    val plan = planOf("q_seqmatch")
    assert(!plan.contains("Join"), s"CEP matching is join-free:\n$plan")
    assert(!plan.contains("Exchange SinglePartition") ||
      plan.contains("TakeOrdered"), // final orderBy may collect; sequences must not
      s"sequence build must stay parallel:\n$plan")
  }

  test("q_bitmap: word build is map-side combined (partial bit_or before the shuffle)") {
    val plan = planOf("q_bitmap")
    val partial = plan.linesIterator.exists(l =>
      l.contains("partial_bit_or") || (l.contains("HashAggregate") && l.contains("bit_or")))
    assert(partial, s"bit_or must partially aggregate before shuffling:\n$plan")
  }

  test("q8_share and q7_volume broadcast every dimension") {
    for (q <- Seq("q8_share", "q7_volume")) {
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin"), s"$q: dims must broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q: no cartesian stage:\n$plan")
    }
  }

  test("q_ewma: series gather keys by event type — never a single-task fold") {
    val plan = planOf("q_ewma")
    assert(!plan.contains("Exchange SinglePartition"),
      s"per-key gather must stay parallel:\n$plan")
  }
}
