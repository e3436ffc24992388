package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The driver tail-captures ~2000 chars of stdout and parses ONE JSON
 *  line out of it — the whole round's bench signal. These tests pin
 *  every fallback of that line's construction (r6 lost its signal to
 *  an overgrown line; never again). */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def parse(line: String) = mapper.readTree(line)

  test("baselineSparkSecs parses the committed BASELINE.md under ANY locale") {
    // the table carries UTF-8 prose around it; under a POSIX locale
    // (US-ASCII default charset — this container) an implicit-codec
    // read throws and the old catch silently returned Map.empty,
    // disabling the contention-rerun pass. Guard: parse must succeed
    // and cover most of the registry.
    val m = Bench.baselineSparkSecs()
    assert(m.size >= 150, s"baseline table parse collapsed: ${m.size} entries")
    assert(m.contains("q1_agg") && m.contains("q8_share"), m.keys.take(5).toSeq.toString)
  }

  test("small surface: full 3-dp line, valid JSON, all queries present") {
    val line = Bench.buildSummaryLine(Seq("q1" -> 0.1234, "q2" -> 1.5), "/sf")
    val j = parse(line)
    assert(j.get("metric").asText == "total")
    assert(j.get("queries").get("q1").asDouble == 0.123)
    assert(j.get("queries").get("q2").asDouble == 1.5)
    assert(j.get("value").asDouble == 1.623)
    assert(!j.has("dropped"))
  }

  test("growing surface coarsens precision before dropping anything") {
    val results = (1 to 80).map(i => s"query_name_$i" -> (i / 7.0))
    val line = Bench.buildSummaryLine(results, "/sf", cap = 1700)
    val j = parse(line)
    assert(j.get("queries").size() == 80, "no entries dropped while coarsening suffices")
    assert(line.length <= 1700)
    // 1-dp rendering in effect (0.142857... -> 0.1)
    assert(j.get("queries").get("query_name_1").asDouble == 0.1)
  }

  test("overflow drops the FASTEST entries, keeps failures and slow queries, counts the dropped") {
    val results = (1 to 200).map(i => s"a_rather_long_query_name_$i" -> (i / 10.0)) ++
      Seq("the_failed_one" -> -1.0, "the_slowest" -> 99.9)
    val line = Bench.buildSummaryLine(results, "/root/testdata/sf0.1", cap = 1800)
    assert(line.length <= 1800, s"line must fit the cap: ${line.length}")
    val j = parse(line)
    val qs = j.get("queries")
    assert(j.get("dropped").asInt == results.size - qs.size())
    assert(j.get("dropped").asInt > 0, "this surface must overflow the cap")
    assert(qs.has("the_failed_one") && qs.get("the_failed_one").asInt == -1,
      "failures are the loudest signal — never dropped")
    assert(qs.has("the_slowest"))
    // dropped entries are exactly the fastest ones
    val kept = (1 to 200).filter(i => qs.has(s"a_rather_long_query_name_$i"))
    assert(kept == (kept.min to 200), "kept set must be a suffix of the speed order")
    // total still covers every successful query
    val expect = BigDecimal((1 to 200).map(_ / 10.0).sum + 99.9)
      .setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(j.get("value").asDouble == expect)
  }

  test("the REAL registry surface always yields a parseable line with a total (r11 lesson)") {
    // r10 asked for a complete 4 KB line; r11 proved the driver's ~2 KB
    // stdout tail capture FRONT-clips anything longer (BENCH_r11.json
    // parsed: null). The binding requirement is therefore: whatever the
    // registry size, the line fits 1800 chars, parses, carries a total
    // over ALL queries, and says how many entries it had to drop —
    // the complete map lives in BENCH_FULL.json.
    val results = SparkEntry.queries.keys.toSeq.map(_ -> 123.456)
    assert(results.size >= 197, s"registry shrank? ${results.size}")
    val line = Bench.buildSummaryLine(results, "/root/testdata/sf0.1")
    assert(line.length <= 1800, s"line must fit the driver's capture window: ${line.length}")
    val j = parse(line)
    val total = BigDecimal(123.456 * results.size)
      .setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(j.get("value").asDouble == total, "the total must cover EVERY query, dropped or not")
    assert(j.get("queries").size() + (if (j.has("dropped")) j.get("dropped").asInt else 0)
      == results.size, "kept + dropped must account for the whole registry")
  }

  test("failure sentinels render as -1 at every precision and do not poison the total") {
    val line = Bench.buildSummaryLine(Seq("ok" -> 2.0, "bad" -> -1.0), "/sf")
    val j = parse(line)
    assert(j.get("queries").get("bad").asInt == -1)
    assert(j.get("value").asDouble == 2.0, "a failure must not subtract from the total")
  }
}
