package graft

/** Driver-contract smoke: entry() on sf0.001 must return rows. */
class EntrySpec extends SparkSpec {
  test("entry returns a non-empty flagship result") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every query name has matching oracle or is rows-only by intent") {
    // all current queries are oracle-checked — catch accidental drops
    SparkEntry.oracleSql.keySet shouldBe SparkEntry.queries.keySet
  }
}
