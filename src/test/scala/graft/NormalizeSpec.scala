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

  test("bitLevenshtein equals Spark's thresholded levenshtein on fuzzed ASCII + edge cases") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val k = graft.functions.TextKernels
    // deterministic fuzz: lengths 0..100 (spanning the 64-bit block
    // boundary), small alphabet so real collisions/edits occur, plus
    // hand-picked edges; reference = Spark's own banded DP
    val rnd = new scala.util.Random(42)
    def rs(n: Int, alpha: Int): String =
      (0 until n).map(_ => ('a' + rnd.nextInt(alpha)).toChar).mkString
    val cases = Seq(
      ("", ""), ("", "abc"), ("abc", ""), ("same", "same"),
      ("a" * 64, "a" * 64), ("a" * 64, "a" * 65), ("a" * 63 + "b", "a" * 64),
      ("kitten", "sitting"), ("flaw", "lawn")) ++
      (1 to 400).map { i =>
        (rs(rnd.nextInt(101), 2 + rnd.nextInt(8)), rs(rnd.nextInt(101), 2 + rnd.nextInt(8)))
      }
    for ((a, b) <- cases; t <- Seq(0, 1, 3, 40, 200)) {
      val got = k.bitLevenshtein(u(a), u(b), t)
      val want = u(a).levenshteinDistance(u(b), t)
      assert(got == want, s"bitLevenshtein('$a','$b',$t) = $got, Spark = $want")
    }
    // non-ASCII falls back to the codepoint DP (same values)
    for ((a, b) <- Seq(("café", "cafe"), ("你好", "你"), ("ábc", "abc"))) {
      assert(k.bitLevenshtein(u(a), u(b), 40) == u(a).levenshteinDistance(u(b), 40))
    }
    // the SQL-visible face: operator-level parity is pinned by
    // editDistancePairs' oracle queries; here pin the Column face
    val df = Seq(("abcdef", "abdcef"), ("xxxxx", "yyyyy")).toDF("a", "b")
    val got = df.select(native.bitLevenshtein(col("a"), col("b"), 3)).collect().map(_.getInt(0))
    assert(got.toSeq == Seq(2, -1))
  }

  test("jaroWinkler matches the classic reference values and edge cases") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val jw = (a: String, b: String) => graft.functions.TextKernels.jaroWinkler(u(a), u(b))
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-12)
    assert(jw("", "") == 0.0 && jw("a", "") == 0.0, "empty sides are 0 (DuckDB variant)")
    assert(jw("a", "a") == 1.0)
    assert(jw("ab", "ba") == 0.0, "window 0 at length 2: no matches")
  }

  test("ewma folds the integer recurrence from the first element") {
    val out = Seq(Seq(100L, 0L, 0L, 200L), Seq(7L), Seq.empty[Long]).toDF("xs")
      .select(native.ewma(col("xs"), a100 = 30)).collect().map(_.getSeq[Long](0))
    // y0=100; y1=(0+70*100)/100=70; y2=(70*70)/100=49; y3=(30*200+70*49)/100=94
    assert(out(0) == Seq(100L, 70L, 49L, 94L))
    assert(out(1) == Seq(7L))
    assert(out(2) == Seq.empty[Long])
    assert(intercept[IllegalArgumentException](
      graft.functions.EwmaExpr(null, 0)).getMessage.contains("a100"))
  }
}
