package graft

/** Plan-shape guards for the round-9 operators. */
class R10PlanSpec extends SparkSpecBase {

  private def planOf(name: String): String =
    QueryRegistry.all.toMap.apply(name).run(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString

  test("q21_waiting: one-scan rewrite — exactly one lineitem scan, no correlated self-join") {
    val plan = planOf("q21_waiting")
    val liScans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(liScans <= 1, s"expected <= 1 lineitem scan, got $liScans:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the supplier dim must broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 must be a distributed TakeOrdered, not a global sort:\n$plan")
  }

  test("dedup_ppjoin: prefix join is an equi-join with no cartesian product and no corpus-wide window") {
    val plan = planOf("dedup_ppjoin")
    assert(!plan.contains("CartesianProduct"), s"no all-pairs stage:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"no stage may collapse to a single partition:\n$plan")
  }

  test("q_resample: the carry window partitions by key — never a single-task global window") {
    val plan = planOf("q_resample")
    assert(!plan.contains("Exchange SinglePartition"),
      s"LOCF window must stay per-key parallel:\n$plan")
  }

  test("graph_pagerank: per-iteration shuffles stay bounded (edges persisted, ranks slim)") {
    // 5 iterations over a persisted degree-annotated edge table: the
    // returned plan is the LAST iteration reading cached blocks — it
    // must reference the in-memory relation, not re-derive the edge
    // pipeline from parquet each round.
    val plan = planOf("graph_pagerank")
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"edge table must come from cache on the final iteration:\n$plan")
  }
}
