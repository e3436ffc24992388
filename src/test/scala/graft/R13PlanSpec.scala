package graft

import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}

/** Plan-shape guards for the synthesized-partsupp TPC-H closures
  * (Q9/Q11/Q20), the derived-shipmode Q12 and BM25 retrieval: dims
  * broadcast, selective filters below the big join, stats one
  * broadcast row. */
class R13PlanSpec extends SparkSpecBase {

  private def q(name: String) = QueryRegistry.all.toMap.apply(name).run(spark, sf("sf0.001"))

  test("q9_profit: partsupp slice, supplier and nation are broadcast dims") {
    val plan = q("q9_profit").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"dimension sides must broadcast:\n$plan")
  }

  test("q11_topstock: the band total joins as ONE broadcast row, not a shuffle") {
    val df = q("q11_topstock")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"scalar total must broadcast:\n$plan")
    assert(df.count() > 0, "the 3x-mean threshold must stay non-degenerate at sf0.001")
  }

  test("q12_shipmode: derived-mode + date filters sit BELOW the orders join") {
    val plan = q("q12_shipmode").queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty, s"expected the orders join:\n$plan")
    def filteredBelow(p: LogicalPlan): Boolean =
      p.collectFirst { case f: Filter
        if f.condition.toString.contains("shipmode") ||
          f.condition.toString.contains("l_shipdate") => f }.isDefined
    assert(joins.exists(j => filteredBelow(j.left) || filteredBelow(j.right)),
      s"the ~2% lineitem cut must happen before the join shuffle:\n$plan")
  }

  test("q20_potential: shipped-qty aggregate is partial (map-side combined)") {
    val plan = q("q20_potential").queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"qty rollup must be a hash aggregate:\n$plan")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"part-filter and supplier lookup must broadcast:\n$plan")
  }

  test("partsupp synthesis is shuffle-free above the part scan") {
    // generation is explode+project over part plus one broadcast
    // scalar — any Exchange below the first consumer join would mean
    // the derivation itself shuffles
    val ps = QueryRegistry.synthPartsuppForTest(spark, sf("sf0.001"))
    val plan = ps.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"partsupp derivation must be map-only over part:\n$plan")
    assert(ps.count() == 4 * spark.read.parquet(sf("sf0.001") + "/part.parquet").count())
    // the 4 rows of one part land on 4 distinct suppliers (17 coprime
    // to |supplier| at every SF)
    import org.apache.spark.sql.functions._
    val dup = ps.groupBy("ps_partkey").agg(countDistinct("ps_suppkey").as("n"))
      .filter(col("n") =!= 4).count()
    assert(dup == 0, "each part must get 4 distinct synthetic suppliers")
  }
}
