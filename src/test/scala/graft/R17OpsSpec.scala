package graft

import graft.operators.{Dedup, Privacy, Temporal, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-11 additions: token-exact duplicated spans, k-anonymity
  * generalization ladder, funnel transition latency, corpus drift
  * divergence. */
class R17OpsSpec extends SparkSpecBase {
  import spark.implicits._

  // ---------------------------------------------- exactDupSpans

  test("exactDupSpans recovers a planted sub-10-token overlap with exact offsets") {
    // 6-token copied span ("one two three four five six") planted at
    // token 3 of doc 1 and token 2 of doc 2, inside otherwise-unique noise
    val docs = Seq(
      (1L, "aa bb cc one two three four five six dd ee"),
      (2L, "ff gg one two three four five six hh"),
      (3L, "ii jj kk ll mm nn oo pp qq rr")).toDF("doc_id", "text")
    val got = Dedup.exactDupSpans(docs, "doc_id", "text", minTokens = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(5))).sorted
    assert(got.toSeq == Seq(
      (1L, 3L, 9L, "one two three four five six"),
      (2L, 2L, 8L, "one two three four five six")),
      s"maximal spans must carry exact [start, end) offsets and the copied text: ${got.toSeq}")
  }

  test("exactDupSpans: overlaps shorter than minTokens stay invisible; whole-doc short dups surface") {
    val docs = Seq(
      (1L, "pp qq rr ss zz yy xx"), // 4-token overlap pp..ss with doc 2
      (2L, "pp qq rr ss aa bb cc"),
      (3L, "tiny doc"), // exact whole-text dup with doc 4 (< minTokens)
      (4L, "tiny doc")).toDF("doc_id", "text")
    val got = Dedup.exactDupSpans(docs, "doc_id", "text", minTokens = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(!got.exists(g => g._1 == 1L || g._1 == 2L),
      s"a 4-token overlap must not survive minTokens=5: ${got.toSeq}")
    assert(got.toSet == Set((3L, 0L, 2L), (4L, 0L, 2L)),
      s"short whole-doc copies ride the single whole-text window: ${got.toSeq}")
  }

  test("exactDupSpans merges adjacent duplicated windows into ONE maximal span") {
    // a 9-token copied run = 5 overlapping 5-windows -> exactly one island
    val run = "k1 k2 k3 k4 k5 k6 k7 k8 k9"
    val docs = Seq(
      (1L, s"u1 u2 $run u3 u4"),
      (2L, s"v1 $run v2 v3 v4")).toDF("doc_id", "text")
    val got = Dedup.exactDupSpans(docs, "doc_id", "text", minTokens = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(got.length == 2 && got.forall(_._4 == 5L),
      s"each doc gets one island of 5 windows: ${got.toSeq}")
    assert(got.toSet == Set((1L, 2L, 11L, 5L), (2L, 1L, 10L, 5L)), got.toSeq.toString)
  }

  // ---------------------------------------------- kAnonymize

  test("kAnonymize releases at the finest level reaching k; ladder is monotone") {
    // 12 rows in city A (>= k=10 at level 0), 5 in city B + 6 in city C,
    // all 23 in one region (so B and C release at level 1)
    val rows = ((1 to 12).map(i => (i.toLong, "A")) ++
      (13 to 17).map(i => (i.toLong, "B")) ++
      (18 to 23).map(i => (i.toLong, "C"))).toDF("id", "city")
    val out = Privacy.kAnonymize(rows, "id", k = 10, levels = Seq(
        Seq("qi" -> col("city")),
        Seq("qi" -> lit("R1")),
        Seq("qi" -> lit("*"))))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(out.filter(_._1 <= 12).forall(r => r._2 == "A" && r._3 == 0 && r._4 == 12L),
      "city A reaches k at the finest level")
    assert(out.filter(_._1 > 12).forall(r => r._2 == "R1" && r._3 == 1 && r._4 == 11L),
      "small cities generalize to the region; group_n counts the RESIDUE the row " +
        "released with (its released equivalence class), not the whole region")
    // every released group really holds >= k rows of the OUTPUT too,
    // and group_n states that class's size exactly
    val groups = out.groupBy(r => (r._2, r._3))
    assert(groups.values.forall(_.size >= 10), s"k-anonymity must hold on the released table: $out")
    assert(groups.values.forall(g => g.forall(_._4 == g.size)),
      s"group_n must equal the released class size: $out")
  }

  test("kAnonymize: a residue row can't borrow company from finer-level releases") {
    // the r11 ADVICE counterexample: k=2, two city-X rows release at city
    // level; the lone city-Y row shares their region, so whole-input
    // counting would release it at region level ALONE (count 3 includes
    // the X rows that released finer) — uniquely identifiable. Residue
    // counting must suppress it instead.
    val rows = Seq((1L, "X", "R"), (2L, "X", "R"), (3L, "Y", "R")).toDF("id", "city", "reg")
    val out = Privacy.kAnonymize(rows, "id", k = 2, levels = Seq(
        Seq("qi" -> col("city")), Seq("qi" -> col("reg"))))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1), r.getInt(2)))
    assert(out.filter(_._1 <= 2).forall(r => r._2 == "X" && r._3 == 0), out.toSeq.toString)
    assert(out.find(_._1 == 3L).get == ((3L, null, -1)),
      s"the lone residue row must be suppressed, not released alone: ${out.toSeq}")
  }

  test("lDiversity flags released classes whose sensitive values are too uniform") {
    // class (X): sensitive {1, 2, 3} -> diverse at l=3;
    // class (Y): sensitive {1, 1, 2} -> only 2 distinct -> flagged
    val rel = Seq(("X", 1L), ("X", 2L), ("X", 3L), ("Y", 1L), ("Y", 1L), ("Y", 2L))
      .toDF("qi", "sens")
    val out = Privacy.lDiversity(rel, Seq("qi"), "sens", l = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(out == Set(("X", 3L, 3L, true), ("Y", 3L, 2L, false)), out.toString)
    assert(intercept[IllegalArgumentException](
      Privacy.lDiversity(rel, Seq("qi"), "sens", l = 0)).getMessage.contains("l must be >= 1"))
  }

  test("kAnonymize suppresses rows no level can release (table smaller than k)") {
    val out = Privacy.kAnonymize(Seq((1L, "x"), (2L, "y")).toDF("id", "c"), "id",
        k = 5, levels = Seq(Seq("qi" -> col("c")), Seq("qi" -> lit("*"))))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.getInt(2), r.isNullAt(3)))
    assert(out.toSet == Set((1L, true, -1, true), (2L, true, -1, true)),
      s"unreleasable rows: NULL QI, anon_level -1, NULL group_n: ${out.toSeq}")
  }

  // ---------------------------------------------- funnelLatency

  test("tCloseness flags the skewed class that distinct-l provably passes") {
    // class A: 10 rows, sensitive values {0 x 8, 1 x 1, 2 x 1} — 3
    // distinct (l=3 diverse!) but heavily skewed toward 0.
    // class B: 10 rows, ~uniform {0,1,2} — also l=3 diverse.
    // global Q over the 20 released rows: P(0)=12/20, P(1)=4/20, P(2)=4/20.
    val rows = ((1 to 8).map(i => (i.toLong, "A", 0L)) ++
      Seq((9L, "A", 1L), (10L, "A", 2L)) ++
      (11 to 14).map(i => (i.toLong, "B", 0L)) ++
      (15 to 17).map(i => (i.toLong, "B", 1L)) ++
      (18 to 20).map(i => (i.toLong, "B", 2L))).toDF("id", "cls", "sens")
    // both classes pass distinct-3-diversity — the audit t-closeness exists to harden
    val ldiv = Privacy.lDiversity(rows, Seq("cls"), "sens", l = 3)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(ldiv == Map("A" -> true, "B" -> true), s"distinct-l must pass both: $ldiv")
    // variational distances, by hand (n=10, N=20, g = (12, 4, 4)):
    //   A: c=(8,1,1): |8*20-12*10| + |1*20-4*10| + |1*20-4*10| = 40+20+20 = 80
    //      d = 80 / (2*10*20) = 0.2
    //   B: c=(4,3,3): |80-120| + |60-40| + |60-40| = 40+20+20 = 80 -> d = 0.2
    // hmm — symmetric classes pull Q to their average; use t = 1/5
    // (d <= 0.2 passes BOTH at equality) and t = 1/10 (fails both),
    // then break the symmetry with a third class.
    val t5 = Privacy.tCloseness(rows, Seq("cls"), "sens", tNum = 1, tDen = 5)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getBoolean(3)))
    assert(t5.toSet == Set(("A", 0.2, true), ("B", 0.2, true)), t5.toSeq.toString)
    val t10 = Privacy.tCloseness(rows, Seq("cls"), "sens", tNum = 1, tDen = 10)
      .collect().map(r => (r.getString(0), r.getBoolean(3)))
    assert(t10.toSet == Set(("A", false), ("B", false)),
      s"exact boundary: 0.2 > 1/10 must fail: ${t10.toSeq}")
    // with a large uniform class anchoring Q, the skewed class fails
    // while the uniform ones pass — the disclosure l-diversity misses
    val rows2 = rows.unionByName(
      ((21 to 80).map { i => (i.toLong, "C", (i % 3).toLong) }).toDF("id", "cls", "sens"))
    val t4 = Privacy.tCloseness(rows2, Seq("cls"), "sens", tNum = 1, tDen = 4)
      .collect().map(r => (r.getString(0), r.getBoolean(3))).toMap
    assert(t4("A") == false && t4("B") == true && t4("C") == true,
      s"only the skewed-but-l-diverse class may fail: $t4")
    // absent (class, value) cells must contribute their global mass:
    // a class missing a value entirely is MORE skewed, not less
    val rows3 = (Seq((1L, "D", 0L), (2L, "D", 0L)) ++
      (3 to 22).map(i => (i.toLong, "E", (i % 4).toLong))).toDF("id", "cls", "sens")
    val d = Privacy.tCloseness(rows3, Seq("cls"), "sens", tNum = 1, tDen = 2)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    // D: n=2, N=22, g0=7, g1..g3=5 each: |2*22-7*2| + 3*|0-5*2| = 30+30 = 60
    //    d = 60/(2*2*22) = 0.681818
    assert(d("D") == 0.681818, s"missing values must count: $d")
  }

  test("funnelLatency measures first-completion chains, in exact ms") {
    // user 1: view@1s, click@4s, purchase@10s -> 3000ms, 6000ms
    // user 2: click@1s (pre-view, ignored), view@2s, click@7s -> 5000ms, no purchase
    // user 3: view only -> contributes nothing
    val ns = 1000000000L
    val ev = Seq(
      (1L, 1 * ns, 1L, "view"), (1L, 4 * ns, 2L, "click"), (1L, 10 * ns, 3L, "purchase"),
      (2L, 1 * ns, 4L, "click"), (2L, 2 * ns, 5L, "view"), (2L, 7 * ns, 6L, "click"),
      (3L, 5 * ns, 7L, "view")).toDF("user_id", "ts", "event_id", "event_type")
    val got = Temporal.funnelLatency(ev, "user_id", "ts", "event_id",
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"))
      .orderBy("step")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(6)))
    // (step, n, p50, avg): 0->1 latencies {3000, 5000} -> p50 4000, avg 4000
    assert(got.toSeq == Seq(("0->1", 2L, 4000L, 4000L), ("1->2", 1L, 6000L, 6000L)),
      got.toSeq.toString)
  }

  // ---------------------------------------------- plan shapes

  test("kAnonymize plan: per-level counts broadcast back — the fact table never shuffles") {
    val rows = (1L to 200L).map(i => (i, s"c${i % 7}")).toDF("id", "city")
    val plan = Privacy.kAnonymize(rows, "id", k = 10, levels = Seq(
        Seq("qi" -> col("city")), Seq("qi" -> lit("*"))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"count back-joins must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no fact-table shuffle join may appear:\n$plan")
  }

  test("exactDupSpans plan: no cartesian/nested-loop anywhere in the span pipeline") {
    val docs = Seq((1L, "aa bb cc dd ee ff"), (2L, "aa bb cc dd ee gg")).toDF("doc_id", "text")
    val plan = Dedup.exactDupSpans(docs, "doc_id", "text", minTokens = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"span extraction must stay equi-join only:\n$plan")
  }

  // ---------------------------------------------- galactic transform

  test("galactic transform matches published J2000 anchor points") {
    import graft.functions.sphere
    // (ra, dec) -> (l, b): vernal equinox, galactic center, NGP
    val pts = Seq((1L, 0.0, 0.0), (2L, 266.405, -28.936), (3L, 192.85948, 27.12825))
      .toDF("id", "ra", "dec")
      .select(col("id"), sphere.galacticL(col("ra"), col("dec")).as("l"),
        sphere.galacticB(col("ra"), col("dec")).as("b"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    def near(a: Double, b: Double, tol: Double) = math.abs(a - b) < tol
    assert(near(pts(1L)._1, 96.337, 0.01) && near(pts(1L)._2, -60.189, 0.01),
      s"vernal equinox: ${pts(1L)}")
    assert(near(pts(2L)._2, 0.0, 0.01) && (pts(2L)._1 < 0.01 || pts(2L)._1 > 359.99),
      s"galactic center maps to (l~0, b~0): ${pts(2L)}")
    assert(near(pts(3L)._2, 90.0, 0.001), s"pole maps to b=90: ${pts(3L)}")
  }

  // ---------------------------------------------- sourceDrift

  test("sourceDrift: identical distributions score zero; a skewed source scores positive") {
    val docs = Seq(
      (1L, "s1", "aa bb cc dd"), (2L, "s1", "aa bb cc dd"),
      (3L, "s2", "aa bb cc dd"), (4L, "s2", "aa bb cc dd"),
      (5L, "s3", "aa aa aa aa")).toDF("doc_id", "source", "text")
    val rows = TextAnalysis.sourceDrift(docs, "source", "text")
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    // s1 and s2 match each other but NOT the corpus (s3 skews the mix),
    // so only compare them to each other and check the ordering signal
    assert(rows("s1") == rows("s2"), "same distribution, same divergence")
    assert(rows("s3")._1 > rows("s1")._1 && rows("s3")._2 > rows("s1")._2,
      s"the skewed source must out-diverge the balanced ones: $rows")
    val uniform = TextAnalysis.sourceDrift(docs.filter(col("source") =!= "s3"), "source", "text")
      .collect().map(r => (r.getDouble(3), r.getDouble(4)))
    assert(uniform.forall(r => r._1 == 0.0 && r._2 == 0.0),
      s"group == corpus -> KL = JSD = 0 exactly: ${uniform.toSeq}")
  }
}
