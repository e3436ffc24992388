package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  private def left = (
    (1 to 3000).map(i => (Some(42L), i.toLong)) ++        // hot key
    (1 to 500).map(i => (Some(i.toLong % 50), 10000L + i)) ++
    Seq((Option.empty[Long], 99999L))                      // null key
  ).toDF("k", "payload")

  private def right = (
    Seq((42L, "hot"), (7L, "seven"), (13L, "thirteen")) ++
    (1 to 5).map(i => (42L, s"dup$i"))                     // dup right rows for the hot key
  ).toDF("rk", "tag")

  test("salted join row-identical to the plain join (inner and left, nulls, dup matches)") {
    for (jt <- Seq("inner", "left_outer")) {
      val plain = left.join(right, col("k") === col("rk"), jt)
        .select("k", "payload", "rk", "tag")
        .collect().map(_.toString).sorted.toSeq
      val salted = Skew.saltedJoin(left, right, "k", "rk", salts = 8, joinType = jt)
        .select("k", "payload", "rk", "tag")
        .collect().map(_.toString).sorted.toSeq
      assert(salted == plain, s"$jt: salted join must be row-identical (${salted.size}/${plain.size})")
    }
  }

  test("the hot key's rows actually spread across salts; join key carries the salt") {
    val saltsUsed = left.filter(col("k") === 42L)
      .withColumn("__salt", pmod(xxhash64(struct(left.columns.map(col): _*)), lit(8L)))
      .select("__salt").distinct().count()
    assert(saltsUsed == 8, s"3000 distinct hot-key rows must cover all 8 salts: $saltsUsed")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Skew.saltedJoin(left, right, "k", "rk", salts = 8)
        .queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), s"join must key on (key, salt):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
  }

  test("guards: bad salts and unsupported join types fail loudly") {
    assert(intercept[IllegalArgumentException](
      Skew.saltedJoin(left, right, "k", "rk", 0)).getMessage.contains(">= 1"))
    assert(intercept[IllegalArgumentException](
      Skew.saltedJoin(left, right, "k", "rk", 4, "right_outer"))
      .getMessage.contains("right replication"))
    assert(intercept[IllegalArgumentException](
      Skew.saltedJoin(left, right, "k", "rk", 4, saltCols = Seq("nope")))
      .getMessage.contains("saltCols"))
  }

  test("saltCols projection changes spread inputs, never the join result") {
    val full = Skew.saltedJoin(left, right, "k", "rk", salts = 8)
      .orderBy("k", "payload", "tag").collect().toSeq
    val proj = Skew.saltedJoin(left, right, "k", "rk", salts = 8,
        saltCols = Seq("payload"))
      .orderBy("k", "payload", "tag").collect().toSeq
    assert(full == proj, "the join result must be salt-invariant")
    // shuffled-hash stays forced: the replicated side must never be a
    // driver-built broadcast (the skew-mitigation contract)
    val plan = Skew.saltedJoin(left, right, "k", "rk", salts = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"salted join must plan shuffled-hash, not broadcast:\n$plan")
  }
}
