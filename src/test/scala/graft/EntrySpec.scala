package graft

/** Pins the driver's flagship smoke contract: entry() returns rows on
 *  the 150-row sf0.001 customer table (wide 30-degree cone). */
class EntrySpec extends SparkSpecBase {
  test("SparkEntry.entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
