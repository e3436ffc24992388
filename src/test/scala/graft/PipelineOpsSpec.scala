package graft

import graft.operators.{Dedup, Sampling, SamplingTestAccess, TextAnalysis}
import org.apache.spark.sql.functions._

/** TF-IDF / deterministic splits / decontamination — the round-3
 *  additions to the training-data pipeline surface. */
class PipelineOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("tfidfTopTerms: ubiquitous terms score below group-specific terms") {
    // 'shared' appears once in every doc (tf = df = N, idf floor);
    // the rare repeated terms must outrank it on tf x idf
    val docs = Seq(
      (1L, "en", "shared unique_alpha unique_alpha unique_alpha one"),
      (2L, "en", "shared filler two words other"),
      (3L, "en", "shared filler three more words"),
      (4L, "de", "shared gemeinsam wort wort wort"),
      (5L, "de", "shared gemeinsam zwei drei vier")
    ).toDF("doc_id", "lang", "text")
    val res = TextAnalysis.tfidfTopTerms(docs, "lang", "doc_id", "text", k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(5))).toSeq
    // 'shared' is in every doc of both groups -> minimal idf, must not
    // beat the group-specific repeated terms
    val enTop = res.filter(_._1 == "en").minBy(_._3)._2
    val deTop = res.filter(_._1 == "de").minBy(_._3)._2
    assert(enTop != "shared", s"ubiquitous term must not rank first: $res")
    assert(deTop == "wort", s"tf=3 group term must rank first in de: $res")
    assert(res.count(_._1 == "en") == 3 && res.count(_._1 == "de") == 3)
    // the two-level aggregate must not plan through an Expand (the
    // count + countDistinct single-agg shape doubles every exploded row)
    val plan = TextAnalysis.tfidfTopTerms(docs, "lang", "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Expand"), s"tf/df aggregate must be Expand-free:\n$plan")
  }

  test("withSplit: deterministic, covers all rows, ~90/5/5, stable across runs") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val s1 = Sampling.withSplit(docs, "doc_id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1.values.sum == docs.count())
    assert(s1.keySet == Set("train", "val", "test"))
    val n = s1.values.sum.toDouble
    assert(math.abs(s1("train") / n - 0.90) < 0.05, s"train share off: $s1")
    // determinism: identical assignment on a re-run
    val a = Sampling.withSplit(docs, "doc_id").select("doc_id", "split").collect().toSet
    val b = Sampling.withSplit(docs, "doc_id").select("doc_id", "split").collect().toSet
    assert(a == b)
  }

  test("deterministicSample: monotone containment and exact determinism") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    def ids(frac: Double) = Sampling.deterministicSample(docs, "doc_id", frac)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s10 = ids(0.1)
    val s30 = ids(0.3)
    assert(s10.subsetOf(s30), "larger fraction must contain the smaller sample")
    assert(s10 == ids(0.1), "sample must be identical across runs")
    val n = docs.count().toDouble
    assert(math.abs(s30.size / n - 0.3) < 0.08, s"fraction off: ${s30.size / n}")
  }

  test("weightedSample: keep rate tracks the score, monotone in score, clamp and NULL handling") {
    import spark.implicits._
    val n = 4000
    // half the rows at score 0.2, half at 0.8, plus clamp/NULL edges
    val rows = (1 to n).map(i => (i.toLong, if (i % 2 == 0) 0.2 else 0.8)) ++
      Seq((100001L, 1.5), (100002L, -0.5), (100003L, Double.NaN))
    val df = rows.toDF("doc_id", "score")
    val kept = Sampling.weightedSample(df, "doc_id", "score")
      .select("doc_id").as[Long].collect().toSet
    val lowRate = (1 to n).count(i => i % 2 == 0 && kept(i.toLong)) / (n / 2.0)
    val highRate = (1 to n).count(i => i % 2 == 1 && kept(i.toLong)) / (n / 2.0)
    assert(math.abs(lowRate - 0.2) < 0.05, s"score-0.2 keep rate: $lowRate")
    assert(math.abs(highRate - 0.8) < 0.05, s"score-0.8 keep rate: $highRate")
    assert(kept(100001L), "score > 1 clamps to always-keep")
    assert(!kept(100002L), "score < 0 clamps to never-keep")
    assert(!kept(100003L), "NaN score must DROP the row — a broken scorer must not flood the sample")
    // monotone: raising every score to 0.8 only ADDS rows
    val raised = Sampling.weightedSample(
        df.withColumn("score", lit(0.8)), "doc_id", "score")
      .select("doc_id").as[Long].collect().toSet
    assert((kept - 100001L).subsetOf(raised),
      "raising scores must never drop a previously kept row")
    // NULL score drops the row
    val withNull = Sampling.weightedSample(
      Seq((1L, Some(0.9)), (2L, None)).toDF("doc_id", "score"), "doc_id", "score")
    assert(!withNull.select("doc_id").as[Long].collect().contains(2L))
  }

  test("stratifiedSample: per-stratum fractions, monotone within a stratum, map-only plan") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    def ids(fr: Map[String, Double]) =
      Sampling.stratifiedSample(docs, "doc_id", "lang", fr, defaultFraction = 0.0)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val en25 = ids(Map("en" -> 0.25))
    val en50 = ids(Map("en" -> 0.5))
    assert(en25.subsetOf(en50), "raising a stratum fraction must only ADD rows")
    assert(ids(Map("en" -> 0.0)).isEmpty, "zero fraction + zero default keeps nothing")
    // stratum independence: adding a de fraction never changes the en rows
    val mixed = Sampling.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 0.25, "de" -> 0.9), 0.0)
      .filter(col("lang") === "en").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(mixed == en25)
    val plan = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.5), 0.1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"stratified sampling must stay map-only:\n$plan")
  }

  test("mixtureSample: temperature flattening, proportional at alpha=1, monotone, map-only filter") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    // alpha=1 degenerates to a uniform global fraction: every source's
    // keep rate is targetFraction, so the kept set equals the plain
    // deterministic sample at the same fraction
    val a1 = Sampling.mixtureSample(docs, "doc_id", "source", temperature = 1.0, targetFraction = 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val flat = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a1 == flat, "alpha=1 mixture must equal the uniform deterministic sample")
    // alpha=0.5 upweights rare sources: rare keep RATE >= dominant keep rate
    val total = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept05 = Sampling.mixtureSample(docs, "doc_id", "source", temperature = 0.5, targetFraction = 0.3)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = total.map { case (s, c) => s -> kept05.getOrElse(s, 0L).toDouble / c }
    val (rare, dom) = (total.minBy(_._2)._1, total.maxBy(_._2)._1)
    if (rare != dom && total(dom) > 2L * total(rare))
      assert(rates(rare) > rates(dom),
        s"sqrt-temperature must upweight the rare source: $rates vs counts $total")
    // monotone in targetFraction (same hash order, higher thresholds)
    val lo = Sampling.mixtureSample(docs, "doc_id", "source", 0.5, 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hi = Sampling.mixtureSample(docs, "doc_id", "source", 0.5, 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi), "raising targetFraction must only ADD rows")
    // the corpus-side plan is a literal-CASE filter: no join, no shuffle
    val plan = Sampling.mixtureSample(docs, "doc_id", "source", 0.5, 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"mixture sampling's corpus pass must stay map-only:\n$plan")
  }

  test("quotaSample: per-group cap, whole small groups, partitioning-invariant") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val kept = Sampling.quotaSample(docs, "doc_id", "source", maxPerGroup = 30)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (src, n) =>
      assert(bySrc.getOrElse(src, 0L) == math.min(n, 30L),
        s"group $src: expected min($n,30), got ${bySrc.get(src)}")
    }
    // the kept set is a function of ids, not of physical layout
    val a = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.quotaSample(docs.repartition(13), "doc_id", "source", 30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "quota selection must be partitioning-invariant")
    // quota monotonicity: a larger cap keeps a superset
    val c = Sampling.quotaSample(docs, "doc_id", "source", 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(c), "raising the cap must only ADD rows")
  }

  test("redactPii: ordered masking, counts on original text") {
    val docs = Seq(
      (1L, "write to a.b@c.org or b@example.co.uk now"),
      (2L, "server 10.0.0.1 and gateway 192.168.1.254"),
      (3L, "call +1 555 123 4567 thanks"),
      (4L, "user@192.168.7.9 mixes forms"), // IP-domain address: not an email (no alpha TLD)
      (5L, "nothing to hide here")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(docs, "text")
      .select("doc_id", "n_emails", "n_phones", "n_ips", "redacted")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4))).toMap
    assert(r(1L)._1 == 2 && r(1L)._4 == "write to [EMAIL] or [EMAIL] now")
    assert(r(2L)._3 == 2 && r(2L)._4 == "server [IP] and gateway [IP]")
    assert(r(3L)._2 == 1 && r(3L)._4 == "call [PHONE] thanks")
    // the email pattern demands an alphabetic TLD, so an IP-domain
    // address is not an email — its embedded IP is still caught
    assert(r(4L)._1 == 0 && r(4L)._4 == "user@[IP] mixes forms")
    assert(r(5L) == ((0L, 0L, 0L, "nothing to hide here")))
  }

  test("withRepetitionStats: duplicate-token and top-bigram fractions, map-only plan") {
    val docs = Seq(
      (1L, "a b c d e"),                 // all distinct, all bigrams unique
      (2L, "spam spam spam spam"),       // 4 tokens, 1 distinct; bigram 'spam spam' x3 of 3
      (3L, "go stop go stop go"),        // 5 tokens, 2 distinct; 'go stop' x2 of 4 bigrams
      (4L, "single")                     // no bigrams
    ).toDF("doc_id", "text")
    val r = TextAnalysis.withRepetitionStats(docs, "text")
      .select("doc_id", "n_tokens", "dup_token_ratio_e4", "top_bigram_ratio_e4")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(1L) == ((5L, 0L, 2500L)))          // 1/4 bigrams = 0.25
    assert(r(2L) == ((4L, 7500L, 10000L)))      // 3/4 dup tokens; bigram 3/3
    assert(r(3L) == ((5L, 6000L, 5000L)))       // 3/5 dup; 'go stop' 2/4
    assert(r(4L) == ((1L, 0L, 0L)))
    val plan = TextAnalysis.withRepetitionStats(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Generate"),
      s"repetition stats must be a single map-only pass (no explode/shuffle):\n$plan")
  }

  test("contaminationCheck: benchmark doc fully matched, disjoint doc untouched") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated text about query engines and pixels"),
      (3L, "the quick brown fox jumps over something else entirely")
    ).toDF("doc_id", "text")
    val bench = Seq("the quick brown fox jumps over the lazy dog tonight").toDF("text")
    val res = Dedup.contaminationCheck(docs, "doc_id", "text", bench, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(res(1L)._1 == res(1L)._2, "identical doc: every shingle matched")
    assert(res(2L)._2 == 0L, "disjoint doc: zero matched")
    assert(res(3L)._2 > 0 && res(3L)._2 < res(3L)._1, "partial overlap strictly between")
  }

  test("collocations: bound pairs outrank frequent-but-independent pairs; floor applies") {
    // "hong kong" always co-occurs (PMI high); "the cat"/"the dog" are
    // frequent but 'the' pairs with everything (PMI ~ 0); "rare gem"
    // occurs once -> excluded by the minCount floor
    val docs = Seq.tabulate(20)(i =>
        (i.toLong, s"hong kong visit number $i the cat and the dog met rare${if (i == 0) " gem" else ""}"))
      .toDF("doc_id", "text")
    val res = TextAnalysis.collocations(docs, "doc_id", "text", minCount = 5, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(res.nonEmpty && res.map(_._5).toSeq == (1L to res.length).toSeq, "dense ranks from 1")
    val byPair = res.map(r => (r._1, r._2) -> r._4).toMap
    assert(byPair.contains(("hong", "kong")), "perfectly bound pair must rank")
    assert(!res.exists(r => r._1 == "rare" && r._2 == "gem"), "hapax pair excluded by floor")
    val hk = byPair(("hong", "kong"))
    assert(byPair.filterKeys(p => p._1 == "the" || p._2 == "the").values.forall(_ < hk),
      "'the X' pairs must score below the bound pair")
    // PMI must be nonincreasing with rank
    val ordered = res.sortBy(_._5).map(_._4)
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b - 1e-9 })
  }

  test("leakage-safe split: exact copies never straddle splits; near-dup composition via CC roots") {
    import graft.operators.{Dedup, Graph, Sampling}
    // many distinct docs + exact copies under different ids
    val base = (1L to 400L).map(i => (i, s"document body number $i with words ${i % 7}"))
    val copies = (1L to 400L by 3).map(i => (i + 10000L, s"document body number $i with words ${i % 7}"))
    val docs = (base ++ copies).toDF("doc_id", "text")
    val split = Sampling.withLeakageSafeSplit(docs, "doc_id", "text")
      .withColumn("__h", org.apache.spark.sql.functions.sha2(Dedup.normalizeText(col("text")), 256))
    // every duplicate group is split-pure
    val impure = split.groupBy("__h").agg(countDistinct("split").as("n")).filter(col("n") > 1).count()
    assert(impure == 0, s"$impure duplicate groups straddle splits")
    // and the split is still a real 90/5/5-ish partition of the GROUPS
    val perSplit = split.select("split").groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSplit.keySet == Set("train", "val", "test") && perSplit("train") > perSplit("val"))
    // near-dup-safe composition: split by the connected-component root
    // of near-dup pairs — same splitCol, cluster-pure by construction
    val pairs = Dedup.nearDuplicates(docs, "doc_id", "text", minJaccard = 0.8)
    val roots = Graph.connectedComponents(pairs, "id_a", "id_b")
    val withRoot = docs.join(roots.select(col("id").as("doc_id"), col("comp")), Seq("doc_id"), "left")
      .withColumn("root", coalesce(col("comp"), col("doc_id")))
    val nd = Sampling.withSplit(withRoot, "root")
    val ndImpure = nd.groupBy("root").agg(countDistinct("split").as("n")).filter(col("n") > 1).count()
    assert(ndImpure == 0, "near-dup clusters must be split-pure under the CC-root composition")
  }

  test("tokenEntropy: hand-computed H, TTR, degenerate and empty docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b b"),          // H = ln 2, TTR = 0.5
      (2L, "a a a a"),          // H = 0, one type
      (3L, "w x y z"),          // H = ln 4, TTR = 1
      (4L, "")                  // no tokens -> no row
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "empty doc produces no row")
    assert(out(1L) == ((4L, 2L, BigDecimal(math.log(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, 5000L)))
    assert(out(2L) == ((4L, 1L, 0.0, 2500L)))
    assert(out(3L) == ((4L, 4L, BigDecimal(math.log(4)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, 10000L)))
  }

  test("negativeSample: never an interacted item, deterministic, capped at k") {
    import spark.implicits._
    val units = (1L to 50L).toDF("u")
    val inter = (1L to 50L).flatMap(u => (0L until 20L).map(i => (u, (u * 7 + i) % 100)))
      .toDF("iu", "ii")
    val out = Sampling.negativeSample(units, "u", inter, "iu", "ii",
      nItems = 100L, k = 5, oversample = 8)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val interSet = inter.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { case (u, it, _) =>
      assert(!interSet.contains((u, it)), s"sampled an interacted item: ($u, $it)") }
    rows.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_._2).distinct.length == rs.length, s"duplicate items for unit $u") }
    val again = Sampling.negativeSample(units.repartition(7), "u", inter, "iu", "ii",
      nItems = 100L, k = 5, oversample = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sorted.toSeq == again.sorted.toSeq, "partitioning-independent")
  }

  test("negativeSample: flatMap kernel is row-identical to the relational groupBy+anti-join+window form") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val nItems = 200L; val k = 4; val m = k * 8
    val units = (1L to 80L).toDF("u")
    // dense-ish interactions so the kernel's skip/stop paths all fire
    val inter = (1L to 80L).flatMap(u => (0L until 60L).map(i => (u, (u * 13 + i * 3) % nItems)))
      .toDF("iu", "ii")
    val kernel = Sampling.negativeSample(units, "u", inter, "iu", "ii", nItems, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val cands = units.select(col("u").as("unit"))
      .withColumn("j", explode(sequence(lit(0L), lit(m - 1L))))
      .withColumn("item", pmod(SamplingTestAccess.knuthHash(col("unit") * m + col("j")), lit(nItems)))
      .groupBy("unit", "item").agg(min("j").as("j"))
    val relational = cands.join(
        inter.select(col("iu").as("unit"), col("ii").as("item")).distinct(),
        Seq("unit", "item"), "left_anti")
      .withColumn("__rn", row_number().over(Window.partitionBy("unit").orderBy("j")))
      .filter(col("__rn") <= k).select("unit", "item", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(kernel == relational,
      s"kernel and relational derivations diverged: ${kernel.size} vs ${relational.size} rows")
  }
}
