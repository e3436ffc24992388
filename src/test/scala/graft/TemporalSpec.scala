package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpecBase {
  import spark.implicits._

  test("asofJoin: latest at-or-before per key, max-tiebreak on equal times, null when none") {
    val left = Seq((1L, 1L, 10L), (2L, 1L, 20L), (3L, 1L, 5L), (4L, 2L, 100L))
      .toDF("eid", "k", "t")
    val right = Seq(
      (1L, 10L, 101L, "a"), // equal to left t=10 → counts (<=)
      (1L, 10L, 102L, "b"), // same time, higher tiebreak → wins
      (1L, 15L, 103L, "c"),
      (9L, 1L, 900L, "z"))  // other key
      .toDF("rk", "rt", "tb", "v")
    val out = Temporal.asofJoin(left, right, "k", "t", "rk", "rt",
        Seq("v"), rightTieBreak = "tb")
      .select("eid", "asof_v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "b", "equal-time right rows count, greatest tiebreak wins")
    assert(out(2L) == "c", "latest at-or-before")
    assert(out(3L) == null, "no preceding right row -> null")
    assert(out(4L) == null, "key with no right rows at all -> null")
  }

  test("asofJoin matches the brute-force theta join + rank on random data") {
    val rnd = new scala.util.Random(7)
    val left = (1L to 300L).map(i => (i, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong)).toDF("eid", "k", "t")
    val right = (1L to 200L).map(i => (i, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100)))
      .toDF("rid", "rk", "rt", "v")
    val fast = Temporal.asofJoin(left, right, "k", "t", "rk", "rt", Seq("rid", "v"),
        rightTieBreak = "rid")
      .select("eid", "asof_rid").collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val slow = left.as("l").join(right.as("r"), $"l.k" === $"r.rk" && $"r.rt" <= $"l.t", "left")
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"l.eid").orderBy($"r.rt".desc_nulls_last, $"r.rid".desc_nulls_last)))
      .filter($"rn" === 1)
      .select($"l.eid", $"r.rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(fast == slow)
  }

  test("asofJoin: a null in one carried column must not splice values from an older row") {
    val left = Seq((1L, 1L, 10L)).toDF("eid", "k", "t")
    val right = Seq(
      (1L, 5L, 1L, Some("old"), Some(10.0)),
      (1L, 6L, 2L, Some("new"), Option.empty[Double])) // winner has a null value col
      .toDF("rk", "rt", "tb", "v", "x")
    val out = Temporal.asofJoin(left, right, "k", "t", "rk", "rt", Seq("v", "x"),
        rightTieBreak = "tb")
      .select("asof_v", "asof_x").collect()(0)
    assert(out.getString(0) == "new" && out.isNullAt(1),
      "all carried columns must come from the SAME (winning) right row")
  }

  test("asofJoin: null right times never match (theta-join semantics)") {
    val left = Seq((1L, 1L, 10L)).toDF("eid", "k", "t")
    val right = Seq((1L, Option.empty[Long], 5L, "nulltime"), (1L, Some(3L), 4L, "real"))
      .toDF("rk", "rt", "tb", "v")
    val out = Temporal.asofJoin(left, right, "k", "t", "rk", "rt", Seq("v"),
        rightTieBreak = "tb")
      .select("eid", "asof_v").collect()
    assert(out(0).getString(1) == "real",
      "a null-time right row must not be carried into later rows")
  }

  test("asofJoin plan: exactly one Exchange (the window's) — no range-join explosion") {
    val left = Seq((1L, 1L, 10L)).toDF("eid", "k", "t")
    val right = Seq((1L, 5L, 1L)).toDF("rk", "rt", "v")
    val plan = Temporal.asofJoin(left, right, "k", "t", "rk", "rt", Seq("v"), rightTieBreak = "rt")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"asofJoin must shuffle exactly once, saw $exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"asofJoin must not plan a product join:\n$plan")
  }

  test("rangeJoin: exact containment, each pair exactly once, empty intervals dropped") {
    val pts = Seq((1L, 0L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, -5L)).toDF("pid", "p")
    val ivs = Seq((100L, 0L, 20L), (200L, 15L, 16L), (300L, 7L, 7L)) // last is empty
      .toDF("iid", "s", "e")
    val out = Temporal.rangeJoin(pts, ivs, "p", "s", "e", bucketWidth = 4)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 100L), (2L, 100L), (3L, 100L)),
      s"expected exact [s, e) containment, got $out")
    // multi-bucket interval must not duplicate pairs
    val dup = Temporal.rangeJoin(pts, ivs, "p", "s", "e", bucketWidth = 4)
      .groupBy("pid", "iid").count().filter(col("count") > 1).count()
    assert(dup == 0, "each (point, interval) pair must appear exactly once")
  }

  test("rangeJoin: negative coordinates use true floor division") {
    val pts = Seq((1L, -1L), (2L, -9L)).toDF("pid", "p")
    val ivs = Seq((100L, -10L, 0L)).toDF("iid", "s", "e")
    val out = Temporal.rangeJoin(pts, ivs, "p", "s", "e", bucketWidth = 4)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L))
  }

  test("rangeJoin plan: equi-join on bucket, no cartesian; explode guard trips on wide intervals") {
    val pts = (0L to 100L).map(i => (i, i)).toDF("pid", "p")
    val ivs = Seq((1L, 0L, 50L)).toDF("iid", "s", "e")
    val plan = Temporal.rangeJoin(pts, ivs, "p", "s", "e", bucketWidth = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"rangeJoin must be an equi-join on the bucket id:\n$plan")
    val e = intercept[IllegalArgumentException] {
      Temporal.rangeJoin(pts, ivs, "p", "s", "e", bucketWidth = 10, maxBucketsPerInterval = 2)
    }
    assert(e.getMessage.contains("buckets"))
  }

  test("funnelStages: strict in-sequence progress, out-of-order steps don't count") {
    val ev = Seq(
      // user 1: full funnel in order -> 3
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "purchase"),
      // user 2: purchase BEFORE click -> stops at 2 (view, click)
      (2L, 10L, 4L, "view"), (2L, 15L, 5L, "purchase"), (2L, 20L, 6L, "click"),
      // user 3: click before any view -> only the later view counts -> 1
      (3L, 5L, 7L, "click"), (3L, 10L, 8L, "view"),
      // user 4: no step-1 event at all -> 0
      (4L, 10L, 9L, "error"),
      // user 5: click at the SAME time as view -> strict < rejects it -> 1
      (5L, 10L, 10L, "view"), (5L, 10L, 11L, "click")
    ).toDF("uid", "t", "eid", "etype")
    val res = Temporal.funnelStages(ev, "uid", "t", "eid",
        Seq(col("etype") === "view", col("etype") === "click", col("etype") === "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L, 5L -> 1L))
  }

  test("funnelStages: later qualifying pair still completes after an early false start") {
    // view(10), purchase(15) [blocked: no click yet], click(20), purchase(25) -> 3
    val ev = Seq((1L, 10L, 1L, "view"), (1L, 15L, 2L, "purchase"),
      (1L, 20L, 3L, "click"), (1L, 25L, 4L, "purchase")).toDF("uid", "t", "eid", "etype")
    val res = Temporal.funnelStages(ev, "uid", "t", "eid",
        Seq(col("etype") === "view", col("etype") === "click", col("etype") === "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res == Map(1L -> 3L))
  }

  test("funnelStages plan: one Exchange total — step columns stack on a single window sort") {
    val ev = Seq((1L, 10L, 1L, "view")).toDF("uid", "t", "eid", "etype")
    val plan = Temporal.funnelStages(ev, "uid", "t", "eid",
        Seq(col("etype") === "view", col("etype") === "click", col("etype") === "purchase"))
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(l => l.contains("Exchange") && !l.contains("Reused"))
    assert(exchanges <= 2, s"window + final agg must share partitioning (got $exchanges):\n$plan")
    assert(plan.linesIterator.count(_.contains("Window [")) >= 1, s"expected a Window operator:\n$plan")
  }

  private def tsOf(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("resampleLocf densifies gaps and carries the last bucket sum forward") {
    // key a: buckets 0 (sum 10+2), 3 (sum 5) -> spine 0..3 with LOCF
    // over the two-gap; key b: single bucket, no gaps
    val df = Seq(
      ("a", tsOf(10L), 10L), ("a", tsOf(50L), 2L), ("a", tsOf(3 * 3600L + 1), 5L),
      ("b", tsOf(7200L), 7L)
    ).toDF("k", "ts", "v")
    val out = Temporal.resampleLocf(df, Seq("k"), "ts", "v", bucketSeconds = 3600L)
      .select("k", "bucket_start", "n_obs", "filled", "value_locf")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000L, r.getLong(2), r.getBoolean(3), r.getLong(4)))
      .toSet
    assert(out == Set(
      ("a", 0L, 2L, false, 12L),
      ("a", 3600L, 0L, true, 12L),
      ("a", 7200L, 0L, true, 12L),
      ("a", 10800L, 1L, false, 5L),
      ("b", 7200L, 1L, false, 7L)))
  }

  test("resampleLocf: all-null value buckets carry the previous sum; leading nulls fall back to 0") {
    val df = Seq(
      ("a", tsOf(10L), null.asInstanceOf[java.lang.Long]),           // bucket 0: obs, null value
      ("a", tsOf(3600L + 5), java.lang.Long.valueOf(4L)),            // bucket 1: real value
      ("a", tsOf(3 * 3600L), null.asInstanceOf[java.lang.Long])      // bucket 3: null again
    ).toDF("k", "ts", "v")
    val out = Temporal.resampleLocf(df, Seq("k"), "ts", "v", bucketSeconds = 3600L)
      .orderBy("bucket_start")
      .collect().map(r => (r.getAs[Long]("n_obs"), r.getAs[Boolean]("filled"), r.getAs[Long]("value_locf")))
    assert(out.toSeq == Seq((1L, true, 0L), (1L, false, 4L), (0L, true, 4L), (1L, true, 4L)))
  }

  test("resampleLocf is partitioning-invariant and spine-bounded") {
    val ev = spark.read.parquet(sf("sf0.001") + "/events.parquet")
    val df = graft.EventsTable.normalizeTs(ev)
      .withColumn("cents", expr("CAST(floor(value * 100) AS BIGINT)"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Temporal.resampleLocf(d, Seq("event_type"), "ts", "cents")
        .collect().map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("bucket_start"),
          r.getAs[Long]("n_obs"), r.getAs[Long]("value_locf"))).toSet
    val a = run(df.repartition(1))
    val b = run(df.repartition(9, col("event_id")))
    assert(a == b)
    // dense spine: per key, rows = max bucket - min bucket + 1
    val spans = Temporal.resampleLocf(df, Seq("event_type"), "ts", "cents")
      .groupBy("event_type").agg(count(lit(1)).as("n"),
        ((max(unix_timestamp(col("bucket_start"))) - min(unix_timestamp(col("bucket_start")))) / 3600 + 1).as("want"))
      .collect()
    spans.foreach(r => assert(r.getLong(1) == r.getDouble(2).toLong, s"dense spine per key: $r"))
  }

  test("overlapJoin emits each overlapping pair exactly once, incl. touch and nest cases") {
    val left = Seq((1L, 0L, 25L), (2L, 30L, 31L), (3L, 100L, 100L)).toDF("lid", "s_lo", "s_hi")
    val right = Seq(
      (10L, 20L, 40L),  // overlaps 1 (tail) and 2 (nested)
      (11L, 25L, 26L),  // touches 1 at the closed endpoint 25
      (12L, 50L, 99L),  // touches nothing (3 starts at 100)
      (13L, 0L, 200L)   // spans everything incl. the point interval 3
    ).toDF("rid", "i_lo", "i_hi")
    val got = Temporal.overlapJoin(left, right, "s_lo", "s_hi", "i_lo", "i_hi", bucketWidth = 10L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "exactly-once emission, no distinct needed")
    assert(got.toSet == Set((1L, 10L), (2L, 10L), (1L, 11L), (1L, 13L), (2L, 13L), (3L, 13L)))
  }

  test("overlapJoin equals the brute-force theta join on seeded random intervals — BOTH paths") {
    val rnd = new scala.util.Random(42)
    val l = Seq.tabulate(80) { i => val a = rnd.nextInt(1000).toLong; (i.toLong, a, a + rnd.nextInt(50)) }
    val r = Seq.tabulate(80) { i => val a = rnd.nextInt(1000).toLong; (i.toLong, a, a + rnd.nextInt(50)) }
    val want = (for {
      (li, ll, lh) <- l; (ri, rl, rh) <- r
      if ll <= rh && rl <= lh
    } yield (li, ri)).toSet
    // broadcast fast path (default: the 80-row sides fit the cap) and
    // the distributed bucket-explode path must agree pair-for-pair
    for (cap <- Seq(1 << 16, 0)) {
      val got = Temporal.overlapJoin(l.toDF("lid", "s_lo", "s_hi"), r.toDF("rid", "i_lo", "i_hi"),
          "s_lo", "s_hi", "i_lo", "i_hi", bucketWidth = 16L, broadcastMaxRows = cap)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == want, s"broadcastMaxRows=$cap")
    }
  }

  test("overlapJoin broadcast path: column order, exactly-once pairs, big-side-left and big-side-right parity") {
    val big = Seq.tabulate(300) { i => (i.toLong, i.toLong * 3, i.toLong * 3 + 10) }
      .toDF("lid", "s_lo", "s_hi")
    val small = Seq((10L, 50L, 70L), (11L, 60L, 65L), (12L, 800L, 2000L)).toDF("rid", "i_lo", "i_hi")
    val a = Temporal.overlapJoin(big, small, "s_lo", "s_hi", "i_lo", "i_hi", 10L)
    assert(a.columns.toSeq == Seq("lid", "s_lo", "s_hi", "rid", "i_lo", "i_hi"),
      "output column order is left-then-right on every path")
    val pairs = a.select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(pairs.length == pairs.toSet.size, "exactly-once emission")
    // swapped roles (small side on the LEFT) — same pair set, same column contract
    val b = Temporal.overlapJoin(small, big, "i_lo", "i_hi", "s_lo", "s_hi", 10L)
    assert(b.columns.toSeq == Seq("rid", "i_lo", "i_hi", "lid", "s_lo", "s_hi"))
    assert(b.select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet == pairs.toSet)
    // a too-big right side with a small LEFT side routes through the
    // left-broadcast arm (still no bucket guard: wide intervals pass)
    val wide = Seq((99L, 0L, 1000000L)).toDF("rid", "i_lo", "i_hi")
    val c = Temporal.overlapJoin(big, wide, "s_lo", "s_hi", "i_lo", "i_hi",
      bucketWidth = 1L, maxBucketsPerInterval = 100L)
    assert(c.count() == 300, "broadcast path needs no bucket guard")
  }

  test("overlapJoin: degenerate intervals match nothing; wide intervals trip the distributed guard") {
    val left = Seq((1L, 10L, 5L)).toDF("lid", "s_lo", "s_hi") // hi < lo
    val right = Seq((2L, 0L, 100L)).toDF("rid", "i_lo", "i_hi")
    for (cap <- Seq(1 << 16, 0))
      assert(Temporal.overlapJoin(left, right, "s_lo", "s_hi", "i_lo", "i_hi", 10L,
        broadcastMaxRows = cap).count() == 0)
    val wide = Seq((3L, 0L, 1000000L)).toDF("lid", "s_lo", "s_hi")
    assert(intercept[IllegalArgumentException] {
      Temporal.overlapJoin(wide, right, "s_lo", "s_hi", "i_lo", "i_hi",
        bucketWidth = 1L, maxBucketsPerInterval = 100L, broadcastMaxRows = 0)
    }.getMessage.contains("overlapJoin"))
  }

  test("hopping windows assign every event to exactly size/slide = 2 windows") {
    val n = graft.EventsTable.normalizeTs(
      spark.read.parquet(sf("sf0.001") + "/events.parquet")).count()
    val q = graft.QueryRegistry.all.toMap.apply("q_hopping")
    val out = q.run(spark, sf("sf0.001"))
    assert(out.agg(sum("n_events")).collect()(0).getLong(0) == 2 * n)
  }

  test("resampleLocf guards its domain") {
    val df = Seq(("a", tsOf(0L), 1L)).toDF("k", "ts", "v")
    assert(intercept[IllegalArgumentException] {
      Temporal.resampleLocf(df, Seq(), "ts", "v")
    }.getMessage.contains("resampleLocf"))
    assert(intercept[IllegalArgumentException] {
      Temporal.resampleLocf(df, Seq("k"), "ts", "v", bucketSeconds = 0L)
    }.getMessage.contains("resampleLocf"))
  }

  test("nearestJoin: min |dt| either direction, before wins ties, no-match null") {
    val left = Seq((1L, 1L, 100L), (2L, 1L, 10L), (3L, 1L, 500L), (4L, 2L, 50L))
      .toDF("lid", "k", "t")
    val right = Seq(
      (10L, 1L, 90L),   // 10 before lid1
      (11L, 1L, 112L),  // 12 after lid1 -> before wins? no: |10| < |12| -> before anyway
      (12L, 1L, 5L),    // 5 before lid2; (13) is 5 after -> tie, before wins
      (13L, 1L, 15L),
      (14L, 1L, 480L))  // nearest to lid3
      .toDF("rid", "rk", "rt")
    val out = Temporal.nearestJoin(left, right, "lid", "k", "t", "rk", "rt",
        Seq("rid"), rightTieBreak = "rid")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) -1L else r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4))))
      .toMap
    assert(out(1L) == ((10L, 10L)), "closest is 10 units before")
    assert(out(2L) == ((12L, 5L)), "equal distance both sides: before wins")
    assert(out(3L) == ((14L, 20L)))
    assert(out(4L) == ((-1L, -1L)), "key with no right rows -> nulls")
  }

  test("nearestJoin matches brute-force on random data") {
    val rnd = new scala.util.Random(29)
    val left = (1L to 300L).map(i => (i, rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong))
      .toDF("lid", "k", "t")
    val rightRows = (1L to 200L).map(i => (i, rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong))
    val right = rightRows.toDF("rid", "rk", "rt")
    val fast = Temporal.nearestJoin(left, right, "lid", "k", "t", "rk", "rt",
        Seq("rid"), rightTieBreak = "rid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    val leftRows = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    leftRows.foreach { case (lid, k, t) =>
      val cands = rightRows.filter(_._2 == k)
      val want =
        if (cands.isEmpty) -1L
        else cands.minBy { case (rid, _, rt) =>
          (math.abs(rt - t), if (rt <= t) 0 else 1, -rid)
        }._1
      assert(fast(lid) == want, s"lid=$lid k=$k t=$t")
    }
  }
}
