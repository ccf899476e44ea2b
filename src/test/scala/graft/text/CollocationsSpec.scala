package graft.text

import graft.SparkSpec

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("collocations score sticky pairs above independent pairs") {
    // "new york" always adjacent; "red" and "blue" frequent but never
    // adjacent to each other consistently
    val docs = (
      Seq.fill(10)("visit new york today") ++
      Seq.fill(10)("red car blue sky") ++
      Seq.fill(10)("blue car red sky")).toDF("text")
    val out = Collocations.topCollocations(docs, "text", minCount = 5, k = 20)
      .as[(Long, String, String, Long, Long, Long, Double)].collect()
    val byPair = out.map(r => (r._2, r._3) -> r._7).toMap
    assert(byPair.contains(("new", "york")))
    // "new york" is a perfect collocation: c_ab = c_a = c_b = 10
    val lift = byPair(("new", "york"))
    // against the corpus totals, the perfect pair's lift is maximal
    assert(out.map(_._7).max === lift)
    // counts are exact
    val row = out.find(r => (r._2, r._3) == (("new", "york"))).get
    assert(row._4 === 10L && row._5 === 10L && row._6 === 10L)
  }

  test("rank orders by pair count with lexical tie-break; min count filters") {
    val docs = (Seq.fill(7)("a b") ++ Seq.fill(7)("a c") ++
      Seq.fill(3)("x y")).toDF("text")
    val out = Collocations.topCollocations(docs, "text", minCount = 5, k = 10)
      .as[(Long, String, String, Long, Long, Long, Double)].collect()
    // (x, y) at 3 occurrences is below minCount
    assert(out.map(r => (r._2, r._3)).toSeq === Seq(("a", "b"), ("a", "c")))
    assert(out.map(_._1).toSeq === Seq(1, 2))
  }

  test("partition-invariant output") {
    val docs = (1 to 60).map(i => s"tok${i % 5} tok${i % 3} tok${i % 7}")
      .toDF("text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Collocations.topCollocations(df, "text", minCount = 2, k = 30)
        .as[(Long, String, String, Long, Long, Long, Double)].collect().toSeq
    assert(run(docs.coalesce(1)) === run(docs.repartition(13)))
  }
}
