package graft

/** Driver smoke contract: `SparkEntry.entry` must return rows on sf0.001. */
class EntrySpec extends SparkSpec {
  test("entry flagship query returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
