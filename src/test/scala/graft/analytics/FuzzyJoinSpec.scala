package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("blocked edit-distance join equals the brute-force cartesian form") {
    // lengths straddle cell boundaries on purpose (d=2 -> cell width 3)
    val corpus = Seq("kettle", "kettles", "bottle", "bot", "throttle",
      "cat", "caterpillar", "xy").toDF("name")
    val probes = Seq("ketle", "botle", "ca", "dog", "caterpilar", "x")
      .toDF("probe")
    val blocked = FuzzyJoin.editDistanceJoin(corpus, probes, "name", "probe", 2)
      .select("probe", "name", "dist").as[(String, String, Int)]
      .collect().toSet
    val brute = probes.crossJoin(corpus)
      .withColumn("dist", levenshtein($"probe", $"name"))
      .filter($"dist" <= 2)
      .select("probe", "name", "dist").as[(String, String, Int)]
      .collect().toSet
    assert(blocked === brute, "blocking must lose no pair and invent none")
    assert(brute.contains(("ketle", "kettle", 1)))
    assert(brute.contains(("ca", "cat", 1)))
  }

  test("no duplicate candidate pairs and distance is exact") {
    val corpus = Seq("aaaa", "aaab", "abab").toDF("name")
    val probes = Seq("aaaa", "aaba").toDF("probe")
    val out = FuzzyJoin.editDistanceJoin(corpus, probes, "name", "probe", 2)
      .select("probe", "name", "dist").as[(String, String, Int)].collect()
    assert(out.length === out.distinct.length, "each pair emitted once")
    val m = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(m(("aaaa", "aaaa")) === 0)
    assert(m(("aaaa", "aaab")) === 1)
    assert(m(("aaba", "aaaa")) === 1)
    assert(m(("aaba", "abab")) === 2)
  }
}
