package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling / dataset splitting for training-data
 * pipelines. Every operator here is MAP-ONLY: assignment is a pure
 * function of the row's id, so it is stable across runs, cluster
 * sizes and partitionings — re-running a 100 TB split yields the
 * same rows in the same splits, and adding data never reshuffles
 * existing assignments (the property `df.sample()` lacks).
 */
object Sampling {

  /** Overflow-safe Knuth multiplicative hash of an id column, mod
   *  2^32 — the same 16-bit-split arithmetic the IVF codebook sample
   *  uses, so plain BIGINT SQL (the DuckDB oracle) reproduces it
   *  exactly and ids >= 2^31 neither wrap nor error under ANSI.
   *  The high 32 bits are folded in first (id XOR id>>>32) so 64-bit
   *  ids sharing low words — e.g. the catalog `_ID` layout
   *  `pix14<<32 | rank`, where row #n of EVERY pixel shares low
   *  bits — don't collide into the same split/sample bucket. For ids
   *  < 2^32 the fold is the identity, so small-key hashes (and their
   *  committed oracles) are unchanged. */
  private[operators] def knuthHash(id: Column): Column = {
    val C = 2654435761L
    val idl = id.cast("long")
    val folded = idl.bitwiseXOR(shiftrightunsigned(idl, 32))
    val idm = pmod(folded, lit(4294967296L))
    pmod(
      shiftleft(pmod(shiftright(idm, 16) * C, lit(4294967296L)), 16) +
        idm.bitwiseAND(lit(0xffffL)) * C,
      lit(4294967296L))
  }

  /** Guard for every id-hash entry point: a non-numeric id column
   *  would cast to null and hash to null — silently assigning all
   *  rows to the last split / dropping every sampled row instead of
   *  erroring. String ids must be pre-hashed to a numeric column by
   *  the caller (with a hash whose SQL twin they control). */
  private[operators] def requireIntegralId(df: DataFrame, idCol: String, op: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$op: id column '$idCol' must be integral (found $dt) — a cast-to-null would " +
        "silently corrupt the assignment; pre-hash string ids to a numeric column")
  }

  /** SQL twin of [[knuthHash]] for DuckDB oracles. Assumes a
   *  nonnegative BIGINT id (DuckDB `>>` is arithmetic; Spark's fold
   *  uses a logical shift — they agree on nonnegative inputs, and
   *  every oracle-checked id column is nonnegative). */
  def knuthHashSql(id: String): String = {
    val f = s"xor($id, $id >> 32)"
    s"((((($f % 4294967296) + 4294967296) % 4294967296 // 65536 * 2654435761) % 4294967296) * 65536" +
      s" + (($f % 4294967296) + 4294967296) % 4294967296 % 65536 * 2654435761) % 4294967296"
  }

  /**
   * Deterministic percentage split: buckets the id hash into 0..99
   * and assigns the first split whose cumulative percentage exceeds
   * the bucket. Percentages must sum to 100.
   */
  /** The one split-assignment expression (hash bucket -> first split
   *  whose cumulative percentage exceeds it), shared by every split
   *  face so id-keyed and rep-keyed splits cannot drift. */
  private def splitCol(id: Column, splits: Seq[(String, Int)]): Column = {
    require(splits.map(_._2).sum == 100, s"split percentages must sum to 100: $splits")
    val bucket = knuthHash(id) % 100
    val cum = splits.scanLeft(0)(_ + _._2).tail
    splits.zip(cum).foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), rest) => when(bucket < hi, lit(name)).otherwise(rest)
    }
  }

  def withSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5)): DataFrame = {
    requireIntegralId(df, idCol, "withSplit")
    df.withColumn("split", splitCol(col(idCol), splits))
  }

  /** SQL twin of [[withSplit]]'s assignment for the default 90/5/5. */
  def splitSql(id: String, splits: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5)): String = {
    val bucket = s"(${knuthHashSql(id)}) % 100"
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val cases = splits.zip(cum).dropRight(1)
      .map { case ((name, _), hi) => s"WHEN $bucket < $hi THEN '$name'" }.mkString(" ")
    s"CASE $cases ELSE '${splits.last._1}' END"
  }

  /**
   * Leakage-safe split: the split is a function of the document's
   * DUPLICATE-GROUP representative, not the document id, so copies
   * of the same content can never straddle train/test — the
   * eval-contamination failure mode a per-id split has by
   * construction (one copy of a test document in train leaks the
   * answer). Groups here are EXACT-duplicate classes (the 256-bit
   * normalized-content hash, [[Dedup.exactDedup]]'s key; rep = min
   * id). For NEAR-dup-safe splits feed [[withSplit]] the cluster
   * root from [[Graph.connectedComponents]] over near-dup pairs
   * instead — same composition, tested in ScalaTest; this operator
   * keeps the oracle-checkable exact-group form.
   *
   * Scale shape: ONE shuffle on the content hash; the rep is a
   * min-window whose partitions are duplicate GROUPS (bounded by
   * copy count, not corpus size), and the split itself stays the
   * map-only hash CASE.
   */
  def withLeakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
                           splits: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5)): DataFrame = {
    requireIntegralId(df, idCol, "withLeakageSafeSplit")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sha2(Dedup.normalizeText(col(textCol)), 256))
    df.withColumn("__rep", min(col(idCol)).over(w))
      .withColumn("split", splitCol(col("__rep"), splits))
      .drop("__rep")
  }

  /** Deterministic fractional sample: keeps rows whose hash bucket
   *  (out of 10000) falls under fraction*10000. Map-only; a superset
   *  sample at a larger fraction always CONTAINS the smaller one. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1]: $fraction")
    requireIntegralId(df, idCol, "deterministicSample")
    df.filter(knuthHash(col(idCol)) % 10000 < math.round(fraction * 10000))
  }

  /**
   * Stratified deterministic sample: a per-stratum keep fraction
   * (e.g. downsample dominant languages, keep the rare ones whole).
   * Still MAP-ONLY: the stratum only selects the hash threshold — a
   * literal CASE over the (small) fraction map, no join, no
   * per-group shuffle. Samples stay monotone within a stratum
   * (raising its fraction only ADDS rows), so curriculum re-mixes
   * never churn previously selected data.
   */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): DataFrame = {
    (fractions.values ++ Seq(defaultFraction)).foreach(f =>
      require(f >= 0 && f <= 1, s"fractions must be in [0,1]: $f"))
    requireIntegralId(df, idCol, "stratifiedSample")
    val thr = fractions.toSeq.sortBy(_._1).foldRight(lit(math.round(defaultFraction * 10000)): Column) {
      case ((k, f), rest) => when(col(strataCol) === k, lit(math.round(f * 10000))).otherwise(rest)
    }
    df.filter(knuthHash(col(idCol)) % 10000 < thr)
  }

  /**
   * Per-group quota cap: keep at most `maxPerGroup` rows per group,
   * chosen by id hash rather than arrival order — the kept set is a
   * uniform-within-group sample, stable across runs, partitionings
   * and cluster sizes. The balancing op for training mixes (cap
   * dominant domains/sources; rare groups pass through whole).
   *
   * One window shuffle keyed by the group column (row_number over the
   * hash order), with map-side work only before it. For a pathological
   * hot group (billions of rows in ONE group) the sort inside that
   * group serializes into one task; the scale-out there is a two-phase
   * prefilter — per-group counts (tiny, map-side-combined), then a
   * hash-threshold filter keeping ~2x maxPerGroup expected survivors
   * before the exact rank — which preserves exactness because the rank
   * ordering IS the hash the threshold cuts on. Not applied by default:
   * it doubles the passes for a regime (quota << group size on a
   * single group) that domain-capped corpora rarely hit.
   */
  def quotaSample(df: DataFrame, idCol: String, groupCol: String, maxPerGroup: Int): DataFrame = {
    require(maxPerGroup >= 0, s"maxPerGroup must be >= 0: $maxPerGroup")
    requireIntegralId(df, idCol, "quotaSample")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      // id tie-break: distinct ids can share a 32-bit hash; without it
      // the kept set would be partitioning-dependent for those ties
      .orderBy(knuthHash(col(idCol)).asc, col(idCol).asc)
    df.withColumn("__qrank", row_number().over(w))
      .filter(col("__qrank") <= maxPerGroup)
      .drop("__qrank")
  }

  /**
   * Per-group token-budget sample: keep documents, in deterministic
   * id-hash order, while the group's cumulative token count stays
   * within `budget` — the mixture op when training targets are token
   * shares rather than document counts ("at most N tokens of web, M
   * of code"). The kept set is a prefix of the group's hash order
   * (cumulative sums are nondecreasing), so it is stable across runs
   * and partitionings and monotone in the budget: raising a group's
   * budget only ADDS documents.
   *
   * One window shuffle keyed by the group column; map-side work only
   * before it. Same hot-group caveat (and the same two-phase
   * prefilter escape hatch) as [[quotaSample]].
   */
  def tokenBudgetSample(df: DataFrame, idCol: String, groupCol: String,
                        tokenCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    requireIntegralId(df, idCol, "tokenBudgetSample")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(knuthHash(col(idCol)).asc, col(idCol).asc)
    df.withColumn("__cum", sum(col(tokenCol).cast("long")).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /**
   * Weighted (importance) deterministic sample: keep each row with
   * probability equal to a per-row score column in [0, 1] — quality-
   * weighted corpus selection ("keep high-quality docs, downsample
   * the tail proportionally"). MAP-ONLY like every sampler here: the
   * decision is `hash(id) % 10000 < round(score * 10000)`, so it is
   * reproducible, partitioning-invariant, and monotone in the score
   * (raising a doc's score can only flip it from dropped to kept —
   * quality-threshold curricula never churn). Scores outside [0, 1]
   * clamp; NULL and NaN scores DROP the row (explicit filters — a
   * broken scorer must not flood the sample: null-skipping
   * greatest/least would clamp NULL to 0 but NaN to 1, the opposite
   * failure mode a quality sampler wants).
   */
  /**
   * EXACT-k weighted sample per group (Efraimidis & Spirakis 2006 —
   * a-res): each row's key is u^(1/w) for deterministic u ∈ (0, 1]
   * from the portable id hash; the k LARGEST keys per group are a
   * weighted sample without replacement with inclusion probability
   * ∝ weight — the "exactly k docs per source, length-weighted"
   * recipe [[weightedSample]]'s Bernoulli form cannot give. The key
   * is realized in the rank-equivalent log form ln(u)/w (monotone in
   * u^(1/w); avoids pow's libm spread), rounded to 9 dp before
   * ranking with an id tiebreak — the repo's pinned-rank convention,
   * so the kept set is identical on any engine/partitioning. One
   * window shuffle on the group key; weights must be >= 1 (rows with
   * smaller weights are dropped — a zero weight has zero inclusion
   * probability anyway).
   */
  def weightedTopK(df: DataFrame, idCol: String, groupCol: String,
                   weightCol: String, k: Int): DataFrame = {
    require(k >= 0, s"k must be >= 0: $k")
    requireIntegralId(df, idCol, "weightedTopK")
    val u = (knuthHash(col(idCol)) + 1).cast("double") / 4294967296.0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__es").desc, col(idCol).asc)
    df.filter(col(weightCol).cast("long") >= 1)
      .withColumn("__es", round(log(u) / col(weightCol).cast("double"), 9))
      .withColumn("__rk", row_number().over(w).cast("long"))
      .filter(col("__rk") <= k)
      .withColumnRenamed("__es", "es_key")
      .withColumnRenamed("__rk", "es_rank")
  }

  /** SQL twin of [[weightedTopK]]'s key/ranking for DuckDB oracles.
   *  Emits ONLY the ranking key expression: the operator's `weight
   *  >= 1` precondition filter is NOT included, so the oracle author
   *  MUST replicate it by hand (`WHERE CAST(w AS BIGINT) >= 1`, as
   *  sample_weighted_k does) — omitting it silently diverges on
   *  zero/negative-weight rows (ADVICE r10). */
  def weightedTopKSql(id: String, weight: String): String =
    s"round(ln((${knuthHashSql(id)} + 1) / 4294967296.0) / CAST($weight AS DOUBLE), 9)"

  def weightedSample(df: DataFrame, idCol: String, scoreCol: String): DataFrame = {
    requireIntegralId(df, idCol, "weightedSample")
    val s = col(scoreCol).cast("double")
    val thr = round(least(greatest(s, lit(0.0)), lit(1.0)) * 10000)
    df.filter(s.isNotNull && !isnan(s) && knuthHash(col(idCol)) % 10000 < thr)
  }

  /**
   * Temperature-based source-mixture sampling (the multilingual
   * alpha-sampling recipe: keep probability per source proportional
   * to count^temperature, renormalized to a global target fraction —
   * flattens dominant sources, upweights rare ones). Per-source keep
   * fraction: f_s = min(1, T * c_s^a / sum_t(c_t^a) / c_s) with
   * T = targetFraction * N; rows kept by the same deterministic
   * id-hash acceptance every sampler here uses, so the kept set is
   * stable across runs/partitionings and monotone in targetFraction.
   *
   * Two jobs: a per-source count aggregate (map-side combined, tiny —
   * guarded at `maxSources` distinct values) collected to the driver,
   * then a MAP-ONLY filter with the thresholds inlined as a literal
   * CASE — no join touches the corpus.
   *
   * Cross-engine determinism: temperature 0.5 and 1.0 use sqrt /
   * identity (IEEE-exact on every engine); other temperatures go
   * through pow, which is only ~1-ulp reproducible across libms — fine
   * for sampling, but oracle hash checks should stick to 0.5/1.0. The
   * power sum is folded in lexicographic source order so any SQL twin
   * can pin the same float-sum order (ordered-aggregate).
   */
  def mixtureSample(df: DataFrame, idCol: String, sourceCol: String,
                    temperature: Double = 0.5, targetFraction: Double = 0.5,
                    maxSources: Int = 100000): DataFrame = {
    require(temperature > 0, s"temperature must be > 0: $temperature")
    require(targetFraction >= 0 && targetFraction <= 1,
      s"targetFraction must be in [0,1]: $targetFraction")
    requireIntegralId(df, idCol, "mixtureSample")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__c"))
      .collect().map(r => Option(r.get(0)).map(_.toString).orNull -> r.getLong(1))
    require(counts.length <= maxSources,
      s"mixtureSample: ${counts.length} distinct sources exceeds maxSources=$maxSources — " +
        "a high-cardinality source column would overflow the driver-side threshold table")
    val powed = counts.sortBy(_._1).map { case (s, c) =>
      val p = temperature match {
        case 0.5 => math.sqrt(c.toDouble)
        case 1.0 => c.toDouble
        case a   => math.pow(c.toDouble, a)
      }
      (s, c, p)
    }
    val n = counts.map(_._2).sum.toDouble
    val denom = powed.foldLeft(0.0)(_ + _._3) // lexicographic order — SQL twins must match
    val thr = powed.map { case (s, c, p) =>
      s -> math.round(math.min(1.0, targetFraction * n * p / denom / c) * 10000)
    }
    val assign = thr.foldRight(lit(0L): Column) { case ((s, t), rest) =>
      if (s == null) when(col(sourceCol).isNull, lit(t)).otherwise(rest)
      else when(col(sourceCol) === s, lit(t)).otherwise(rest)
    }
    df.filter(knuthHash(col(idCol)) % 10000 < assign)
  }

  /** SQL twin of [[weightedSample]]'s predicate for DuckDB oracles. */
  def weightedSampleSql(id: String, score: String): String =
    s"(($score) IS NOT NULL AND NOT isnan(CAST(($score) AS DOUBLE)) AND " +
      s"(${knuthHashSql(id)}) % 10000 < round(least(greatest(CAST(($score) AS DOUBLE), 0.0), 1.0) * 10000))"

  /** SQL twin of [[stratifiedSample]]'s predicate for DuckDB oracles
   *  (empty-map-safe; stratum keys with quotes escaped). */
  def stratifiedSampleSql(id: String, strata: String,
                          fractions: Map[String, Double],
                          defaultFraction: Double = 0.0): String = {
    val dflt = math.round(defaultFraction * 10000)
    val thr =
      if (fractions.isEmpty) dflt.toString // a WHEN-less CASE is a syntax error
      else fractions.toSeq.sortBy(_._1)
        .map { case (k, f) => s"WHEN $strata = '${k.replace("'", "''")}' THEN ${math.round(f * 10000)}" }
        .mkString("CASE ", " ", s" ELSE $dflt END")
    s"(${knuthHashSql(id)}) % 10000 < ($thr)"
  }

  /**
   * Deterministic negative sampling (contrastive/recsys training
   * prep): for every unit, k items it did NOT interact with, drawn by
   * hashing (unit, j) into the item id space — no cross join with the
   * item dimension ever happens. Each unit explodes to k*oversample
   * bounded candidates, duplicates keep the smallest j, interactions
   * anti-join away, and the first k survivors (by j) are the sample —
   * fully replayable in SQL via [[knuthHashSql]]. A unit whose
   * candidates are all interacted yields fewer than k rows (the
   * oversample factor bounds that probability for sparse
   * interactions). Item ids must be dense in [0, nItems).
   *
   * Plan shape (only slim long pairs ever shuffle, and the
   * interactions side aggregates only a sliver):
   *
   *  1. A MAP-ONLY membership filter shrinks the interactions to the
   *     sliver that is actually in some unit's candidate set: per
   *     interaction row, ONE compiled kernel call
   *     ([[graft.functions.NegHitExpr]]) loops the unit's m draws and
   *     tests item equality — no candidate explode, no shuffle at
   *     all for this stage. (History: through r11 this was a Bloom
   *     filter built over exploded candidates in a separate job;
   *     r12-r14 an exact semi-join against the m·|units| exploded
   *     candidate pairs — correct but it shuffled m·|units| +
   *     |interactions| rows; the EXPRESSION-TREE form of the per-row
   *     test — m inlined hash subtrees — fell out of whole-stage
   *     codegen past ~600 nodes and measured 25x slower, which is
   *     why the loop is a kernel, not a Column tree.) Only the
   *     sliver pays the (tiny) groupBy(unit, collect_set(item))
   *     shuffle before broadcasting back onto the units.
   *  2. One typed flatMap over (unit, interacted-candidates) draws
   *     the m hashes in j order, skips repeats (= the old
   *     groupBy.min(j)) and interacted items (= the old anti-join),
   *     and stops at the first k survivors (= the old per-unit
   *     row_number window) — per-unit draw generation is genuinely
   *     sequential-imperative, which is why this stage is a kernel
   *     and not three exchange-inducing relational ops.
   *
   * Row-identical to the relational groupBy + anti-join + window
   * formulation (the spec pins kernel-vs-relational parity).
   */
  def negativeSample(units: DataFrame, unitCol: String,
                     interactions: DataFrame, iUnitCol: String, iItemCol: String,
                     nItems: Long, k: Int, oversample: Int = 8): DataFrame = {
    require(k >= 1, s"negativeSample: k must be >= 1, got $k")
    require(oversample >= 2, s"negativeSample: oversample must be >= 2, got $oversample")
    require(nItems >= 1, s"negativeSample: nItems must be >= 1, got $nItems")
    requireIntegralId(units, unitCol, "negativeSample")
    val m = k * oversample
    val unitType = units.schema(unitCol).dataType
    // map-only membership filter (see plan-shape doc above): one
    // kernel call per interaction row replaces the r12-r14 exploded
    // candidate semi-join and its m·|units|-row shuffle
    val sliver = interactions
      .select(col(iUnitCol).cast("long").as("unit"), col(iItemCol).cast("long").as("item"))
    val sliverByUnit = sliver
      .filter(org.apache.spark.sql.GraftBridge.column(graft.functions.NegHitExpr(
        org.apache.spark.sql.GraftBridge.expression(sliver("unit")),
        org.apache.spark.sql.GraftBridge.expression(sliver("item")), m, nItems)))
      .groupBy("unit").agg(collect_set("item").as("__hit"))
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val kk = k; val nn = nItems // stable locals for the closure
    val out = units.select(col(unitCol).cast("long").as("unit"))
      .join(broadcast(sliverByUnit), Seq("unit"), "left")
      .select(col("unit"), coalesce(col("__hit"), typedLit(Array.empty[Long])).as("__hit"))
      .as[(Long, Array[Long])]
      .flatMap { case (unit, hit) =>
        val seen = new scala.collection.mutable.HashSet[Long]
        val res = Seq.newBuilder[(Long, Long, Long)]
        var j = 0L; var emitted = 0
        while (j < m && emitted < kk) {
          val item = graft.functions.SketchKernels.knuth(unit * m + j) % nn
          if (seen.add(item) && !hit.contains(item)) {
            res += ((unit, item, j)); emitted += 1
          }
          j += 1
        }
        res.result()
      }
      .toDF("unit", "item", "j")
    out.select(col("unit").cast(unitType).as("unit"), col("item"), col("j"))
  }

  /** SQL twin of [[negativeSample]]'s candidate generation: the
   *  (unit, j) -> item hash over `generate_series`. `nItemsExpr` may
   *  be a literal or a scalar subquery. */
  def negativeSampleItemSql(unitExpr: String, jExpr: String, m: Int, nItemsExpr: String): String =
    s"(${knuthHashSql(s"($unitExpr * $m + $jExpr)")}) % ($nItemsExpr)"
}
