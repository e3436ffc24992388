package graft

import graft.operators.{Merge, Spatial, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-10 additions: friends-of-friends group finding, delete-aware
  * CDC changelog apply, trigram-index substring search. */
class R16OpsSpec extends SparkSpecBase {
  import spark.implicits._

  // ------------------------------------------------------------- FoF

  test("selfPairs matches brute force and emits each pair exactly once") {
    // deterministic scatter incl. a dense knot near (10, 0)
    val pts = (1L to 60L).map { k =>
      (k, (k * 37 % 360).toDouble + (k % 7) * 0.01, ((k * 53 % 120) - 60).toDouble * 0.7)
    }.toDF("id", "ra", "dec")
    val got = Spatial.selfPairs(pts, "ra", "dec", "id", dthreshDeg = 8.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "no duplicate pairs without a distinct()")
    val rows = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val want = (for {
      (a, ra1, d1) <- rows; (b, ra2, d2) <- rows
      if a < b && graft.healpix.Healpix.gcDistDeg(ra1, d1, ra2, d2) < 8.0
    } yield (a, b)).toSet
    assert(got.toSet == want, s"pixel-pruned pairs must equal brute force " +
      s"(missing ${want -- got.toSet}, extra ${got.toSet -- want})")
  }

  test("fofGroups percolates chains: a-b-c linked pairwise-partially is ONE group") {
    // b within 2.5 of both a and c, but a-c > 2.5: percolation joins all three
    val pts = Seq((1L, 100.0, 0.0), (2L, 102.0, 0.0), (3L, 104.0, 0.0),
      (4L, 200.0, 40.0)).toDF("id", "ra", "dec")
    val g = Spatial.fofGroups(pts, "ra", "dec", "id", dthreshDeg = 2.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"chain must percolate into one group labeled by its min id; isolated point absent: $g")
  }

  test("pair joins stay pixel-bucketed equi-joins — never a cartesian/nested-loop product") {
    val pts = (1L to 200L).map(k => (k, (k * 37 % 360).toDouble, ((k * 53 % 160) - 80).toDouble))
      .toDF("id", "ra", "dec")
    for (df <- Seq(
      Spatial.selfPairsDist(pts, "ra", "dec", "id", 2.5),
      Spatial.crossPairsDist(pts, pts, "ra", "dec", "id", "ra", "dec", "id", 2.5))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"pair generation must be the pixel equi-join:\n$plan")
      assert(plan.contains("hpix"), s"join key must be the healpix pixel:\n$plan")
    }
  }

  test("crossPairsDist matches brute force between two catalogs (no a<b halving)") {
    val left = (1L to 25L).map(k => (k, (k * 41 % 360).toDouble, ((k * 29 % 100) - 50).toDouble))
      .toDF("id", "ra", "dec")
    val right = (1L to 25L).map(k => (k, (k * 59 % 360).toDouble, ((k * 31 % 100) - 50).toDouble))
      .toDF("id", "ra", "dec")
    val got = Spatial.crossPairsDist(left, right, "ra", "dec", "id", "ra", "dec", "id", 10.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "each ordered cross pair exactly once")
    val l = left.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val rr = right.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val want = (for {
      (a, ra1, d1) <- l; (b, ra2, d2) <- rr
      if graft.healpix.Healpix.gcDistDeg(ra1, d1, ra2, d2) < 10.0
    } yield (a, b)).toSet
    assert(got.toSet == want, s"missing ${want -- got.toSet}, extra ${got.toSet -- want}")
  }

  test("two-point binning: hand-placed pairs land in the expected separation bins") {
    // pairs at known equatorial separations: 1.0 deg -> bin 0, 2.0 -> bin 1 (edges 0.5+1.5k)
    val pts = Seq((1L, 100.0, 0.0), (2L, 101.0, 0.0), (3L, 103.0, 0.0)).toDF("id", "ra", "dec")
    val bins = Spatial.selfPairsDist(pts, "ra", "dec", "id", 8.0)
      .withColumn("sep9", round(col("_DIST"), 9))
      .filter(col("sep9") >= 0.5 && col("sep9") < 8.0)
      .withColumn("bin", floor((col("sep9") - 0.5) / 1.5).cast("long"))
      .groupBy("bin").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // separations: (1,2)=1.0 bin0, (2,3)=2.0 bin1, (1,3)=3.0 bin1
    assert(bins == Map(0L -> 1L, 1L -> 2L), s"got $bins")
  }

  test("hpixCenter expressions match pix2angNest; smoothing conserves mass at full-sky radius") {
    import graft.functions.sphere
    val pix = spark.range(0, 192).select(col("id").as("pix"),
      sphere.hpixCenterRa(col("id"), 2).as("ra"), sphere.hpixCenterDec(col("id"), 2).as("dec"))
      .collect()
    pix.foreach { r =>
      val (era, edec) = graft.healpix.Healpix.pix2angNest(2, r.getLong(0))
      assert(r.getDouble(1) == era && r.getDouble(2) == edec, s"center mismatch at ${r.getLong(0)}")
    }
    // tophat at radius 181 deg sums the WHOLE map into every pixel;
    // at ~0 radius each pixel keeps only itself
    import spark.implicits._
    val hist = Seq((0L, 5L), (100L, 7L), (191L, 11L)).toDF("pix", "cnt")
      .select(col("pix"), col("cnt"),
        sphere.hpixCenterRa(col("pix"), 2).as("pra"), sphere.hpixCenterDec(col("pix"), 2).as("pdec"))
    def smooth(r: Double) = Spatial.crossPairsDist(hist, hist,
        "pra", "pdec", "pix", "pra", "pdec", "pix", r)
      .join(hist.select(col("pix").as("id_b"), col("cnt").as("cnt_b")), "id_b")
      .groupBy("id_a").agg(sum("cnt_b").as("s"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(smooth(181.0) == Map(0L -> 23L, 100L -> 23L, 191L -> 23L), "full-sky beam = total mass")
    assert(smooth(1e-9) == Map(0L -> 5L, 100L -> 7L, 191L -> 11L), "zero beam = identity")
  }

  test("hpix_transients: every emitted row satisfies the exact flag rule; zero-years flaggable") {
    val rows = QueryRegistry.all.toMap.apply("hpix_transients").run(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty, "sf0.001 should surface at least one flagged (pixel, year)")
    rows.foreach { r =>
      val (cnt, total) = (r.getLong(2), r.getLong(3))
      val dev = 7L * cnt - total
      assert(dev * dev > 63L * total, s"flag rule violated: $r")
    }
    // a pixel whose history is concentrated in few years flags its
    // ZERO years too once total > 9*T (dev = -total, total^2 > 63*total)
    val zeroFlagged = rows.filter(_.getLong(2) == 0L)
    assert(zeroFlagged.forall(_.getLong(3) > 63L), "zero-year flags need total > 9T")
  }

  // ------------------------------------------------------------- CDC

  test("applyChangelog: last op wins, deletes drop, inserts/updates/kept classified") {
    val base = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("key", "cents")
    val log = Seq(
      (2L, 1L, "upsert", 777L),  // update key 2
      (2L, 2L, "delete", 0L),    // ... then delete it — delete wins (later)
      (3L, 1L, "delete", 0L),    // delete key 3 ...
      (3L, 2L, "upsert", 999L),  // ... then re-insert — upsert wins
      (9L, 1L, "upsert", 555L),  // brand-new key
      (8L, 1L, "delete", 0L)     // delete of a key that never existed
    ).toDF("key", "seq", "op", "cents")
    val out = Merge.applyChangelog(base, log, "key", "cents",
        opCol = "op", deleteOp = "delete", orderCols = Seq("seq"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3))).toMap
    assert(out == Map(
      1L -> ((100L, "kept", 0L)),
      3L -> ((999L, "updated", 2L)),
      9L -> ((555L, "inserted", 1L))), s"got $out")
  }

  test("applyChangelog collapses the log with an aggregate, not a window sort") {
    val base = Seq((1L, 100L)).toDF("key", "cents")
    val log = Seq((1L, 1L, "upsert", 1L)).toDF("key", "seq", "op", "cents")
    val plan = Merge.applyChangelog(base, log, "key", "cents", "op", "delete", Seq("seq"))
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    assert(plan.collect { case w: LWindow => w }.isEmpty,
      s"log collapse must be a struct-max aggregate, never a window:\n$plan")
  }

  test("ancestorPairs: exact closure on a hand tree; deep chain converges in log rounds") {
    import graft.operators.Graph
    // ternary-ish tree: 0 <- {1,2,3}, 1 <- {4,5}, 4 <- {6}
    val par = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L), (6L, 4L))
      .toDF("node", "parent")
    val got = Graph.ancestorPairs(par, "node", "parent")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Set((1L,0L),(2L,0L),(3L,0L),(4L,1L),(4L,0L),(5L,1L),(5L,0L),
      (6L,4L),(6L,1L),(6L,0L))
    assert(got == want, s"missing ${want -- got}, extra ${got -- want}")
    // a 70-deep chain resolves within the 20-round bound (log2(70) ~ 7
    // doubling rounds) and yields exactly sum(depth) = 70*71/2 pairs
    val chain = (1L to 70L).map(k => (k, k - 1)).toDF("node", "parent")
    assert(Graph.ancestorPairs(chain, "node", "parent").count() == 70L * 71 / 2,
      "pointer doubling must reach every ancestor of a deep chain")
  }

  test("weightedTopK: exactly k per group, partitioning-invariant, weight-monotone bias") {
    import graft.operators.Sampling
    val rows = (1L to 600L).map { k =>
      // two groups; weights 1 for even ids, 100 for ids % 10 == 1
      (k, if (k % 2 == 0) "a" else "b", if (k % 10 == 1) 100L else 1L)
    }.toDF("id", "grp", "w")
    val kept = Sampling.weightedTopK(rows, "id", "grp", "w", k = 10)
    val perGroup = kept.groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGroup == Map("a" -> 10L, "b" -> 10L), s"exactly k per group: $perGroup")
    // identical kept set under a different partitioning
    val kept2 = Sampling.weightedTopK(rows.repartition(13), "id", "grp", "w", k = 10)
    assert(kept.select("id").collect().map(_.getLong(0)).toSet ==
      kept2.select("id").collect().map(_.getLong(0)).toSet, "kept set must be partitioning-invariant")
    // group b: 60 ids carry weight 100 vs 240 with weight 1 — the
    // heavy rows must dominate the sample (ES inclusion ∝ weight)
    val heavy = kept.filter(col("grp") === "b" && col("w") === 100L).count()
    assert(heavy >= 7, s"weight-100 rows must dominate the k=10 sample, got $heavy")
  }

  // ------------------------------------------- trigram substring search

  test("trigramSearch finds exact positions and prunes gram-anagram false candidates") {
    val docs = Seq(
      (1L, "the merge batch runs nightly"),           // contains at pos 5
      (2L, "batch merge the nightly runs"),           // all grams of "merge batch"? no: 'e b' missing
      (3L, "MERGE, BATCH!? the merge batch again"),   // normalization finds it
      (4L, "no relevant content here"),
      // all trigrams present but never contiguous: "merge batch" grams
      // are {mer,erg,rge,ge ,e b, ba,bat,atc,tch}; craft "merge bxtch merge batch"-free
      (5L, "xmerge bzz ge batch yy e b")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.trigramSearch(docs, "doc_id", "text", "Merge; BATCH")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // normalized query = "merge batch"
    assert(got(1L) == 5L, s"1-based pos in normalized text: $got")
    // doc 3 normalizes to "merge batch the merge batch again" — FIRST hit is pos 1
    assert(got(3L) == 1L, s"got $got")
    assert(!got.contains(2L) && !got.contains(4L), s"got $got")
    assert(!got.contains(5L), "gram-complete but non-contiguous doc must fail the verify")
  }

  test("text_hybrid: ranks live in [1, k+1], fused is their exact sum, output ascending") {
    val rows = QueryRegistry.all.toMap.apply("text_hybrid").run(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val (rs, rd, f) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rs >= 1 && rs <= 31 && rd >= 1 && rd <= 31, s"rank domain: $r")
      assert(f == rs + rd, s"fused must be the exact rank sum: $r")
      assert(rs <= 30 || rd <= 30, "a fused row must appear in at least one tower")
    }
    val fused = rows.map(_.getLong(3))
    assert(fused.sameElements(fused.sorted), "output must ascend by fused rank")
  }

  test("trigramProbe over stored postings returns exactly trigramSearch's results") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val postings = TextAnalysis.trigramPostings(docs, "doc_id", "text")
    val q = "table value part"
    val viaIndex = TextAnalysis.trigramProbe(postings, docs, "doc_id", "text", q)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaScan = TextAnalysis.trigramSearch(docs, "doc_id", "text", q)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex == viaScan, s"index and scan paths must agree " +
      s"(index-only ${viaIndex -- viaScan}, scan-only ${viaScan -- viaIndex})")
    // the scan path is one map-only pass: no shuffle of any kind
    val plan = TextAnalysis.trigramSearch(docs, "doc_id", "text", q)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scan search must not shuffle:\n$plan")
  }

  test("trigramSearch guards degenerate queries and short docs") {
    val docs = Seq((1L, "ab"), (2L, "abc")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.trigramSearch(docs, "doc_id", "text", "ab")
    }
    val got = TextAnalysis.trigramSearch(docs, "doc_id", "text", "abc")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 1L), s"short docs index no grams, exact-length doc matches: $got")
  }
}
