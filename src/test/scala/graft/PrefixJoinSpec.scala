package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Exactness and shape of the AllPairs/PPJoin prefix-filtered
 *  set-similarity join (Dedup.prefixFilterJoin). */
class PrefixJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = {
    val base = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "text").limit(150)
    val plants = Seq(
      (200001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (200002L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact dup
      (200003L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // 9/11 = 0.818
      (200004L, "alpha beta gamma nu xi omicron pi rho sigma tau"),           // 3/17 = 0.18
      (200005L, ""),                                                          // empty doc
      (200006L, "   ")                                                        // blank doc
    ).toDF("doc_id", "text")
    base.union(plants)
  }

  /** Brute-force distinct-word Jaccard with the operator's own
   *  integer decision rule — the exactness reference. */
  private def bruteForce(t100: Int): Map[(Long, Long), Long] = {
    val toks = corpus
      .select(col("doc_id"), explode(split(Dedup.normalizeText(coalesce(col("text"), lit(""))), " ")).as("tok"))
      .filter(col("tok") =!= "").distinct()
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    val ids = toks.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = toks(ids(i)); b = toks(ids(j))
      inter = (a & b).size.toLong
      union = a.size + b.size - inter
      if inter * 100 >= union * t100
    } yield (ids(i), ids(j)) -> (inter * 10000L) / union).toMap
  }

  test("prefixFilterJoin is EXACT: pair set and jaccard_e4 equal brute force at t=0.6") {
    val got = Dedup.prefixFilterJoin(corpus, "doc_id", "text", t100 = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val want = bruteForce(60)
    assert(got.keySet == want.keySet,
      s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
    assert(got == want, "jaccard_e4 must match the integer brute force exactly")
    assert(got.contains((200001L, 200002L)) && got((200001L, 200002L)) == 10000L)
    assert(got.contains((200001L, 200003L)))
    assert(!got.contains((200001L, 200004L)), "0.18 pair is below threshold")
  }

  test("prefixFilterJoin result is partitioning-invariant") {
    val a = Dedup.prefixFilterJoin(corpus.repartition(1), "doc_id", "text", t100 = 70)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = Dedup.prefixFilterJoin(corpus.repartition(7, col("doc_id")), "doc_id", "text", t100 = 70)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b)
  }

  test("prefix emission honors the sz - ceil(t*sz) + 1 cut (no full-set self-join)") {
    // at t100=80 a 10-token doc keeps 10 - 8 + 1 = 3 prefix tokens;
    // the planted disjoint-suffix pair (overlap only via prefix
    // tokens' global rarity ordering) must still be found when above
    // threshold, and the join must never be a cartesian product.
    val plan = Dedup.prefixFilterJoin(corpus, "doc_id", "text", t100 = 80)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Cartesian"), s"prefix join must stay an equi-join:\n$plan")
    val got = Dedup.prefixFilterJoin(corpus, "doc_id", "text", t100 = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == bruteForce(80).keySet, "still exact at the tighter threshold")
  }

  test("prefixFilterJoin guards its threshold domain") {
    val e = intercept[IllegalArgumentException] {
      Dedup.prefixFilterJoin(corpus, "doc_id", "text", t100 = 0)
    }
    assert(e.getMessage.contains("prefixFilterJoin"))
  }
}
