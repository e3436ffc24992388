package graft

import graft.functions.native
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpecBase {
  import spark.implicits._

  private val eAcuteComposed = "\u00e9"        // é
  private val eAcuteDecomposed = "e\u0301"     // e + combining acute
  private val aRingComposed = "\u00c5"         // Å
  private val aRingDecomposed = "A\u030A"      // A + combining ring

  test("nfcNormalize composes decomposed sequences and is identity on NFC input") {
    val df = Seq(
      ("ascii only", "ascii only"),
      (s"caf$eAcuteDecomposed", s"caf$eAcuteComposed"),
      (s"${aRingDecomposed}B", s"${aRingComposed}B"),
      (s"caf$eAcuteComposed", s"caf$eAcuteComposed"), // already composed: unchanged
      ("", ""))
      .toDF("in", "expect")
    val out = df.select(native.nfcNormalize(col("in")).as("got"), col("expect")).collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("nfcNormalize shortens char length of decomposed text") {
    val out = Seq(s"x${eAcuteDecomposed}x").toDF("s")
      .select(length(col("s")), length(native.nfcNormalize(col("s")))).head()
    assert(out.getInt(0) == 4 && out.getInt(1) == 3)
  }

  test("nfc_normalize is registered as a SQL function and null-safe") {
    val r = spark.sql(
      s"SELECT nfc_normalize('$eAcuteDecomposed'), nfc_normalize(CAST(NULL AS STRING))").head()
    assert(r.getString(0) == eAcuteComposed)
    assert(r.isNullAt(1))
  }
}
