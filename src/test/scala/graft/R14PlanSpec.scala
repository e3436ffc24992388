package graft

import org.apache.spark.sql.functions._

/** Round-10 additions: YoY lag-window shape and the composed
  * entity-resolution pipeline's structural invariants. */
class R14PlanSpec extends SparkSpecBase {

  private def q(name: String) = QueryRegistry.all.toMap.apply(name).run(spark, sf("sf0.001"))

  test("q_yoy: nation broadcasts; the lag window sorts the rollup, not the fact table") {
    val df = q("q_yoy")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"nation dim must broadcast:\n$plan")
    // the Window must consume an Aggregate, never the raw orders scan
    val opt = df.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val wins = opt.collect { case w: LWindow => w }
    assert(wins.nonEmpty && wins.forall(_.child.collectFirst { case a: Aggregate => a }.isDefined),
      s"lag window must sit above the nation×year aggregate:\n$opt")
    assert(df.count() > 0)
  }

  test("pipeline_er: entity partition is consistent (sizes sum to corpus, one canonical each)") {
    val out = q("pipeline_er").cache()
    try {
      val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet").count()
      assert(out.count() == docs, "every document gets exactly one entity row")
      // csize really is the entity's row count
      val bad = out.groupBy("entity_id").agg(count(lit(1)).as("n"), first("csize").as("c"),
          sum(when(col("is_canonical"), 1).otherwise(0)).as("canon"))
        .filter(col("n") =!= col("c") || col("canon") =!= 1).count()
      assert(bad == 0, "each entity: csize == member count and exactly one canonical")
      // canonical representative is the smallest member id
      val badCanon = out.groupBy("entity_id").agg(min("doc_id").as("lo"))
        .filter(col("entity_id") =!= col("lo")).count()
      assert(badCanon == 0, "entity_id must be the component minimum")
    } finally out.unpersist()
  }
}
