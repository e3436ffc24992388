package graft

/** Plan-shape guard for q5_local: exactly one big-table shuffle
 *  (orders |><| lineitem); every dim joins as a broadcast. */
class Q5PlanSpec extends SparkSpecBase {
  test("q5_local: one shuffle join, dims broadcast") {
    val df = QueryRegistry.all.toMap.apply("q5_local").run(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    val smj = "SortMergeJoin".r.findAllIn(plan).size
    val shj = "ShuffledHashJoin".r.findAllIn(plan).size
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(smj + shj <= 1, s"q5_local must shuffle only orders|><|lineitem:\n$plan")
    assert(bhj >= 4, s"customer/supplier/nation/region must broadcast:\n$plan")
  }
}
