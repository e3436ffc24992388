package graft

import graft.operators.{Packing, Sampling, SamplingTestAccess}
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b c d e"), (2L, "f g"), (3L, ""), (4L, "h i j k"),
    (5L, "one two three four five six seven eight nine ten"),
    (6L, "x"), (7L, "p q r"), (8L, "s t u v w"),
    (9L, (1 to 40).map(i => s"w$i").mkString(" ")), // oversize vs budget 8
    (10L, "zz yy")
  ).toDF("doc_id", "text")
    .withColumn("n_tok", size(split(trim(col("text")), "\\s+")).cast("long"))

  test("packGreedy: every multi-doc sequence fits the budget; singletons may exceed it") {
    val out = Packing.packGreedy(docs, "doc_id", "n_tok", budget = 8L, nBuckets = 3)
    val seqs = out.groupBy("bucket", "seq")
      .agg(sum("n_tok").as("tot"), count(lit(1)).as("n_docs")).collect()
    assert(seqs.nonEmpty)
    seqs.foreach { r =>
      val (tot, n) = (r.getLong(2), r.getLong(3))
      assert(n == 1 || tot <= 8L, s"multi-doc sequence over budget: $r")
    }
    // the oversize doc (40 tokens) sits alone in its sequence
    val over = out.filter(col("doc_id") === 9L).collect().head
    val mates = out.filter(col("bucket") === over.getLong(1) && col("seq") === over.getLong(2)).count()
    assert(mates == 1L)
  }

  test("packGreedy: every doc appears exactly once; result invariant to input partitioning") {
    val a = Packing.packGreedy(docs, "doc_id", "n_tok", 8L, 3)
    assert(a.select("doc_id").distinct().count() == 10L && a.count() == 10L)
    val b = Packing.packGreedy(docs.repartition(7, col("text")), "doc_id", "n_tok", 8L, 3)
    assert(a.except(b).count() == 0L && b.except(a).count() == 0L)
  }

  test("packGreedy: next-fit recurrence holds within each bucket's hash order") {
    val out = Packing.packGreedy(docs, "doc_id", "n_tok", 8L, 2)
      .withColumn("h", SamplingTestAccess.knuthHash(col("doc_id")))
      .orderBy("bucket", "h", "doc_id").collect()
    var (bkt, seq, run) = (-1L, 0L, 0L)
    out.foreach { r =>
      val (b, s, tok) = (r.getLong(1), r.getLong(2), r.getLong(4))
      if (b != bkt || run + tok > 8L) {
        assert(s == (if (b != bkt) 1L else seq + 1L), s"seq break wrong at $r")
        bkt = b; seq = s; run = tok
      } else { assert(s == seq, s"unexpected seq change at $r"); run += tok }
    }
  }

  test("packGreedy: randomized trials hold the packing invariants (seeded)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 50 + rnd.nextInt(150)
      val budget = 16L + rnd.nextInt(64)
      val buckets = 1 + rnd.nextInt(5)
      // token counts skewed: mostly small, some oversize (> budget)
      val rows = (1 to n).map { i =>
        val tok = if (rnd.nextInt(10) == 0) budget + 1 + rnd.nextInt(20)
                  else 1L + rnd.nextInt(budget.toInt)
        (i.toLong * 7919, tok)
      }
      val df = rows.toDF("doc_id", "n_tok")
      val out = Packing.packGreedy(df, "doc_id", "n_tok", budget, buckets)
      val collected = out.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(collected.length == n && collected.map(_._1).distinct.length == n,
        s"trial $trial: docs lost or duplicated")
      // multi-doc sequences fit the budget; seq ids contiguous from 1
      collected.groupBy(r => (r._2, r._3)).foreach { case ((b, s), docs) =>
        assert(docs.length == 1 || docs.map(_._5).sum <= budget,
          s"trial $trial: over-budget multi-doc seq ($b, $s)")
        assert(docs.map(_._4).sorted.toSeq == (1L to docs.length).toSeq,
          s"trial $trial: seq_pos not contiguous in ($b, $s)")
      }
      collected.groupBy(_._2).foreach { case (b, docs) =>
        val seqs = docs.map(_._3).distinct.sorted.toSeq
        assert(seqs == (1L to seqs.length).toSeq, s"trial $trial: seq ids not contiguous in bucket $b")
      }
      // partitioning invariance
      val again = Packing.packGreedy(df.repartition(3 + trial), "doc_id", "n_tok", budget, buckets)
      assert(out.except(again).count() == 0L && again.except(out).count() == 0L,
        s"trial $trial: result depends on input partitioning")
    }
  }

  test("chunkTokens: full coverage, overlap contract, short and empty docs") {
    val out = Packing.chunkTokens(docs, "doc_id", "text", window = 4, overlap = 1)
    // short doc (2 tokens) -> one chunk, text preserved
    val d2 = out.filter(col("doc_id") === 2L).collect()
    assert(d2.length == 1 && d2.head.getAs[String]("chunk") == "f g" && d2.head.getAs[Long]("n_tok") == 2L)
    // empty doc -> one chunk of the single empty token
    val d3 = out.filter(col("doc_id") === 3L).collect()
    assert(d3.length == 1 && d3.head.getAs[String]("chunk") == "" && d3.head.getAs[Long]("n_tok") == 1L)
    // 10-token doc, window 4 stride 3 -> chunks at 0,3,6 (covers token 9? 6+4=10 yes) -> 3 chunks
    val d5 = out.filter(col("doc_id") === 5L).orderBy("chunk_id").collect()
    assert(d5.length == 3)
    assert(d5.map(_.getAs[Long]("tok_start")).toSeq == Seq(0L, 3L, 6L))
    // consecutive chunks share exactly `overlap` boundary tokens
    val toks5 = "one two three four five six seven eight nine ten".split(" ")
    d5.foreach { r =>
      val start = r.getAs[Long]("tok_start").toInt
      val expect = toks5.slice(start, math.min(start + 4, toks5.length)).mkString(" ")
      assert(r.getAs[String]("chunk") == expect)
    }
    // every token of every doc is covered by at least one chunk
    val cover = out.groupBy("doc_id")
      .agg(max(col("tok_start") + col("n_tok")).as("covered")).as[(Long, Long)].collect().toMap
    docs.select("doc_id", "n_tok").as[(Long, Long)].collect().foreach { case (id, n) =>
      assert(cover(id) == n, s"doc $id: covered ${cover(id)} of $n tokens")
    }
  }

  test("chunkTokens is map-only (no Exchange in the plan)") {
    val plan = Packing.chunkTokens(docs, "doc_id", "text", 4, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("tokenBudgetSample: kept set is a budget-bounded prefix of the group hash order, monotone in budget") {
    val src = docs.withColumn("grp", (col("doc_id") % 2).cast("string"))
    val kept = Sampling.tokenBudgetSample(src, "doc_id", "grp", "n_tok", budget = 12L)
    // per-group totals within budget
    kept.groupBy("grp").agg(sum("n_tok").as("tot")).collect()
      .foreach(r => assert(r.getLong(1) <= 12L))
    // prefix property: a kept doc's cumulative sum <= budget implies every
    // hash-earlier doc in the group is kept too
    val ordered = src.withColumn("h", SamplingTestAccess.knuthHash(col("doc_id")))
      .orderBy("grp", "h", "doc_id").select("grp", "doc_id", "n_tok").as[(String, Long, Long)].collect()
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    ordered.groupBy(_._1).foreach { case (_, rows) =>
      val firstDrop = rows.indexWhere(r => !keptIds.contains(r._2))
      if (firstDrop >= 0) rows.drop(firstDrop).foreach(r =>
        assert(!keptIds.contains(r._2), s"non-prefix keep: ${r._2}"))
    }
    // monotone: smaller budget keeps a subset
    val fewer = Sampling.tokenBudgetSample(src, "doc_id", "grp", "n_tok", budget = 5L)
      .select("doc_id").as[Long].collect().toSet
    assert(fewer.subsetOf(keptIds))
  }

  test("packGreedy fails loudly (operator-named) on NULL token counts, not with a bare NPE") {
    val src = Seq((1L, Some(5L)), (2L, None), (3L, Some(3L)))
      .toDF("doc_id", "n_tok")
    val e = intercept[Exception](
      Packing.packGreedy(src, "doc_id", "n_tok", budget = 10L, nBuckets = 2).collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m => m.contains("packGreedy") && m.contains("NULL")),
      s"expected an operator-named NULL error, got: $e")
  }
}
