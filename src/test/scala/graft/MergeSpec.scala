package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpecBase {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "bal")

  test("upsert: update wins (nulls included), insert appended, base carried") {
    val updates = Seq(
      (2L, Option.empty[String], 99.0), // update with an explicit NULL name
      (4L, Some("d"), 40.0)             // insert
    ).toDF("k", "name", "bal")
    val out = Merge.upsert(base, updates, "k").orderBy("k")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSeq
    assert(out == Seq(
      (1L, Some("a"), 10.0),
      (2L, None, 99.0), // SCD1: the update's NULL overwrites
      (3L, Some("c"), 30.0),
      (4L, Some("d"), 40.0)))
  }

  test("self-merge (updates derived from base) resolves without ambiguity") {
    val updates = base.filter($"k" % 2 === 1).withColumn("bal", $"bal" + 5)
    val out = Merge.upsert(base, updates, "k").orderBy("k")
      .select("k", "bal").as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 15.0), (2L, 20.0), (3L, 35.0)))
  }

  test("duplicate update keys raise at execution; schema mismatch refused eagerly") {
    val dup = Seq((2L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "name", "bal")
    val e = intercept[Exception](Merge.upsert(base, dup, "k").collect())
    assert(e.getMessage.contains("duplicate update key"), e.getMessage)
    assert(intercept[IllegalArgumentException](
      Merge.upsert(base, base.drop("bal"), "k")).getMessage.contains("schema mismatch"))
    assert(intercept[IllegalArgumentException](
      Merge.upsert(base, base, "nope")).getMessage.contains("no key column"))
  }

  test("merge result is partitioning-invariant and key-complete") {
    val updates = Seq((3L, "cc", 33.0), (9L, "i", 90.0)).toDF("k", "name", "bal")
    val a = Merge.upsert(base, updates, "k").orderBy("k").collect().toSeq
    val b = Merge.upsert(base.repartition(7), updates.repartition(3), "k")
      .orderBy("k").collect().toSeq
    assert(a == b)
    assert(a.map(_.getLong(0)) == Seq(1L, 2L, 3L, 9L))
  }
}
