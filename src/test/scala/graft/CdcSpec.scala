package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Content-defined chunking: shift-robust boundaries. */
class CdcSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def chunksOf(text: String, id: Long = 1L): Seq[(Long, Long, Long, Long)] =
    TextAnalysis.cdcChunks(docs(id -> text), "doc_id", "text")
      .orderBy("chunk_seq")
      .select("chunk_seq", "first_pos", "n_tok", "chunk_fp")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("chunks tile the document; expected length near targetTok") {
    val n = 4000
    val text = (1 to n).map(i => s"t${(i * 2654435761L) % 99991}").mkString(" ")
    val cs = chunksOf(text)
    assert(cs.map(_._3).sum == n, "chunks must cover every token exactly once")
    assert(cs.map(_._2) == cs.map(_._2).sorted, "first_pos monotone in chunk_seq")
    val mean = n.toDouble / cs.size
    assert(mean > 16 && mean < 64, f"mean chunk length $mean%.1f should sit near targetTok=32")
  }

  test("the CDC property: a front insertion leaves downstream chunk fingerprints unchanged") {
    val body = (1 to 1000).map(i => s"w${(i * 48271L) % 9973}").mkString(" ")
    val orig = chunksOf(body).map(_._4)
    val edited = chunksOf("inserted preamble tokens here " + body, id = 2L).map(_._4)
    // everything after resynchronization is bit-identical: the edited
    // doc must retain the vast majority of the original chunk hashes
    val kept = orig.toSet.intersect(edited.toSet).size
    assert(kept >= orig.size - 3,
      s"only $kept/${orig.size} chunk fps survived a front edit — boundaries are not content-defined")
    // the fixed-window CONTRAST: chunkTokens shifts every window
    val fixedO = graft.operators.Packing.chunkTokens(docs(1L -> body), "doc_id", "text", 64, 16)
      .select("chunk").as[String].collect().toSet
    val fixedE = graft.operators.Packing.chunkTokens(
        docs(2L -> ("inserted preamble tokens here " + body)), "doc_id", "text", 64, 16)
      .select("chunk").as[String].collect().toSet
    assert(fixedO.intersect(fixedE).size < kept,
      "fixed windows must lose more chunks than CDC under the same edit (the operator's point)")
  }

  test("deterministic across partitionings; identical docs chunk identically") {
    val body = (1 to 500).map(i => s"x${i % 173}").mkString(" ")
    val two = docs(1L -> body, 2L -> body)
    val out = TextAnalysis.cdcChunks(two, "doc_id", "text")
      .select("doc_id", "chunk_seq", "chunk_fp")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    assert(out(1L).map(t => (t._2, t._3)).sorted.toSeq == out(2L).map(t => (t._2, t._3)).sorted.toSeq)
    val a = TextAnalysis.cdcChunks(two, "doc_id", "text").orderBy("doc_id", "chunk_seq").collect().toSeq
    val b = TextAnalysis.cdcChunks(two.repartition(5), "doc_id", "text")
      .orderBy("doc_id", "chunk_seq").collect().toSeq
    assert(a == b)
  }

  test("geometry guards") {
    assert(intercept[IllegalArgumentException](
      TextAnalysis.cdcChunks(docs(1L -> "x"), "doc_id", "text", g = 0)).getMessage.contains("[1, 16]"))
    assert(intercept[IllegalArgumentException](
      TextAnalysis.cdcChunks(docs(1L -> "x"), "doc_id", "text", targetTok = 1))
      .getMessage.contains("[2, 4096]"))
  }
}
