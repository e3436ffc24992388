package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  test("train learns the hand-computed merge sequence on the classic corpus") {
    // low x3, lower x1, lowest x1 — worked by hand:
    //   pair counts: (l,o)=5 (o,w)=5 (w,e)=2 (e,r)=1 (e,s)=1 (s,t)=1
    //   tie (l,o)/(o,w) at 5 -> lexicographic: (l,o) first
    //   then (lo,w)=5; then (low,e)=2; then all-1 tie -> (lowe,r)
    val docs = Seq("low low low", "lower lowest").toDF("text")
    val merges = Bpe.train(docs, "text", nMerges = 4)
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r")))
    // encode with the learned merges reproduces training's final state
    assert(Bpe.encodeWord("low", merges).toSeq == Seq("low"))
    assert(Bpe.encodeWord("lower", merges).toSeq == Seq("lower"))
    assert(Bpe.encodeWord("lowest", merges).toSeq == Seq("lowe", "s", "t"))
    // an unseen word decomposes by the same merges
    assert(Bpe.encodeWord("slow", merges).toSeq == Seq("s", "low"))
  }

  test("training is deterministic and partitioning-invariant") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(regexp_replace(lower(col("text")), "[^a-z]+", " ").as("clean"))
    val m1 = Bpe.train(docs, "clean", nMerges = 5, maxWordLen = 12)
    val m2 = Bpe.train(docs.repartition(7), "clean", nMerges = 5, maxWordLen = 12)
    assert(m1 == m2, "merge sequence must not depend on partitioning")
  }

  test("driver-side merge replay matches the distributed loop exactly") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(regexp_replace(lower(col("text")), "[^a-z]+", " ").as("clean"))
    val local = Bpe.train(docs, "clean", nMerges = 6, maxWordLen = 12)
    spark.conf.set("spark.graft.bpe.localMaxWords", "0")
    try {
      val dist = Bpe.train(docs, "clean", nMerges = 6, maxWordLen = 12)
      assert(local == dist, "local replay must reproduce the distributed merges")
    } finally spark.conf.unset("spark.graft.bpe.localMaxWords")
  }

  test("encode: more merges never increases a document's token count; NULL text counts 0") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), regexp_replace(lower(col("text")), "[^a-z]+", " ").as("clean"))
    val merges = Bpe.train(docs, "clean", nMerges = 6, maxWordLen = 12)
    def counts(ms: Seq[Bpe.Merge]): Map[Long, Long] =
      Bpe.encodeCounts(docs, "doc_id", "clean", ms, maxWordLen = 12)
        .as[(Long, Long)].collect().toMap
    val c3 = counts(merges.take(3)); val c6 = counts(merges)
    assert(c3.keySet == c6.keySet)
    c6.foreach { case (id, n) => assert(n <= c3(id), s"doc $id grew: ${c3(id)} -> $n") }
    // NULL text -> 0 tokens
    val z = Bpe.encodeCounts(Seq((9L, null: String)).toDF("doc_id", "clean"),
      "doc_id", "clean", merges).as[(Long, Long)].collect().head
    assert(z == ((9L, 0L)))
    // overlong words encode as one opaque token
    val one = Bpe.encodeCounts(Seq((1L, "supercalifragilistic")).toDF("doc_id", "clean"),
      "doc_id", "clean", merges, maxWordLen = 12).as[(Long, Long)].collect().head
    assert(one == ((1L, 1L)))
  }

  test("applyMerge is the left-to-right non-overlapping scan") {
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(Bpe.applyMerge(Array("a", "b", "a", "b"), "a", "b").toSeq == Seq("ab", "ab"))
    assert(Bpe.applyMerge(Array("x"), "a", "b").toSeq == Seq("x"))
  }
}
