package graft

import graft.operators.Validate
import graft.operators.Validate._
import org.apache.spark.sql.functions._

class ValidateSpec extends SparkSpecBase {
  import spark.implicits._

  private def table = Seq(
    (Some(1L), Some(5.0), "A", "x1"),
    (Some(2L), Some(500.0), "A", "x2"),   // range violation
    (Some(2L), Some(7.0), "Q", "x3"),     // dup id + accepted violation
    (None, Some(8.0), "N", "bad token"),  // null id + regex violation
    (Some(4L), None, "R", "x5")           // null value: range-exempt
  ).toDF("id", "v", "flag", "code")

  test("every check type counts its violations exactly; report shape and pass bits") {
    val ref = Seq(1L, 2L, 3L).toDF("ref_id")
    val rep = Validate.validate(table, Seq(
      NotNull("id"),
      InRange("v", 0, 100),
      Accepted("flag", Seq("A", "N", "R")),
      Matches("code", "^x[0-9]+$"),
      Unique("id"),
      RefIntegrity("id", ref, "ref_id")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rep(("not_null", "id")) == ((1L, 5L, 0L)))
    assert(rep(("in_range", "v")) == ((1L, 5L, 0L)), "null v is range-exempt")
    assert(rep(("accepted", "flag")) == ((1L, 5L, 0L)))
    assert(rep(("matches", "code")) == ((1L, 5L, 0L)))
    // id=2 twice -> one row beyond the first; NULL id exempt (4 non-null rows)
    assert(rep(("unique", "id")) == ((1L, 4L, 0L)))
    // non-null ids {1,2,2,4}; 4 is not in ref -> 1 orphan
    assert(rep(("ref_integrity", "id")) == ((1L, 4L, 0L)))
  }

  test("a clean table passes every check; job count does not grow with the suite") {
    val clean = Seq((1L, 10.0, "A"), (2L, 20.0, "N")).toDF("id", "v", "flag")
    val listener = new org.apache.spark.scheduler.SparkListener {
      @volatile var jobs = 0
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    def countJobs(f: => Unit): Int = {
      spark.sparkContext.addSparkListener(listener)
      try {
        listener.jobs = 0
        f
        val deadline = System.currentTimeMillis() + 5000
        while (listener.jobs < 1 && System.currentTimeMillis() < deadline) Thread.sleep(50)
        Thread.sleep(300)
        listener.jobs
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val one = countJobs(Validate.validate(clean, Seq(NotNull("id"))))
    var repDf: org.apache.spark.sql.DataFrame = null
    val five = countJobs {
      repDf = Validate.validate(clean, Seq(
        NotNull("id"), NotNull("v"), NotNull("flag"),
        InRange("v", 0, 100), Accepted("flag", Seq("A", "N"))))
    }
    // the fused agg scan must cost the same number of jobs at 1 check
    // and at 5 (the report collect below is outside both countJobs)
    assert(five == one, s"row-level checks must share one scan: 1-check=$one jobs, 5-check=$five")
    assert(repDf.collect().forall(r => r.getLong(2) == 0L && r.getLong(4) == 1L))
  }

  test("profile: one pass, typed metrics, null handling, guards") {
    val df = Seq(
      (Some(1L), Some(2.5), Some("b"), Some(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))),
      (Some(3L), None, Some("a"), None),
      (None, Some(7.5), None, Some(java.sql.Timestamp.valueOf("2020-01-02 00:00:00")))
    ).toDF("k", "v", "s", "t")
    val p = Validate.profile(df, Seq("k", "v", "s", "t"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("k").getLong(1) == 3 && p("k").getLong(2) == 1)
    assert(p("k").getDouble(3) == 1.0 && p("k").getDouble(4) == 3.0 && p("k").getDouble(5) == 2.0)
    assert(p("v").getDouble(5) == 5.0, "mean skips nulls")
    assert(p("s").isNullAt(3) && p("s").getString(6) == "a" && p("s").getString(7) == "b")
    assert(p("t").getDouble(4) - p("t").getDouble(3) == 86400e6, "timestamp bounds in micros")
    assert(p("t").isNullAt(5) && p("t").isNullAt(6))
    assert(intercept[IllegalArgumentException](
      Validate.profile(df, Seq("nope"))).getMessage.contains("no such column"))
    assert(intercept[IllegalArgumentException](
      Validate.profile(df, Nil)).getMessage.contains("no columns"))
  }

  test("cli: validate/profile dispatch, eager spec errors, e2e run on real parquet") {
    // bad specs fall to usage at PARSE time
    assert(Cli.parse(Array("validate", "x.parquet", "range:c:abc:2")).isLeft)
    assert(Cli.parse(Array("validate", "x.parquet", "frobnicate:c")).isLeft)
    assert(Cli.parse(Array("profile", "x.parquet")).isLeft) // missing cols arg
    // e2e: run the parsed actions against the real sf0.001 tables
    val li = sf("sf0.001") + "/lineitem.parquet"
    val ord = sf("sf0.001") + "/orders.parquet"
    val spec = s"not_null:l_orderkey,range:l_quantity:1:50," +
      s"accepted:l_returnflag:A|N|R,matches:l_linestatus:^[A-Z]$$," +
      s"unique:l_orderkey,fk:l_orderkey:$ord:o_orderkey"
    Cli.parse(Array("validate", li, spec)) match {
      case Right(run) => run(spark) // prints the report; must not throw
      case Left(m) => fail(s"validate spec must parse: $m")
    }
    Cli.parse(Array("profile", li, "l_orderkey,l_quantity,l_returnflag")) match {
      case Right(run) => run(spark)
      case Left(m) => fail(s"profile must parse: $m")
    }
  }

  test("empty TABLE: every check passes with zero violations; profile reports zero rows") {
    val empty = Seq.empty[(Long, Double, String)].toDF("id", "v", "flag")
    val rep = Validate.validate(empty, Seq(
      NotNull("id"), InRange("v", 0, 1), Accepted("flag", Seq("A")), Unique("id")))
      .collect()
    assert(rep.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(4) == 1L),
      "an empty snapshot is a legitimate gate input — all pass, no NPE")
    val prof = Validate.profile(empty, Seq("id", "v", "flag")).collect()
    assert(prof.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L && r.isNullAt(3)))
  }

  test("empty suite refused; report preserves suite order") {
    assert(intercept[IllegalArgumentException](
      Validate.validate(table, Nil)).getMessage.contains("empty check suite"))
    val rep = Validate.validate(table, Seq(Unique("id"), NotNull("id"), InRange("v", 0, 1e9)))
      .select("check").as[String].collect().toSeq
    assert(rep == Seq("unique", "not_null", "in_range"))
  }
}
