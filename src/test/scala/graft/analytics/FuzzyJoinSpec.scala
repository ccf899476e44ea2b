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

  test("segment blocking equals brute force (incl. short-string fallback)") {
    val corpus = Seq("kettle", "kettles", "bottle", "bot", "throttle",
      "cat", "caterpillar", "xy", "ab").toDF("name")
    val probes = Seq("ketle", "botle", "ca", "dog", "caterpilar", "x", "b")
      .toDF("probe")
    val seg = FuzzyJoin.editDistanceJoinSegments(corpus, probes, "name", "probe", 2)
      .select("probe", "name", "dist").as[(String, String, Int)]
      .collect()
    val brute = probes.crossJoin(corpus)
      .withColumn("dist", levenshtein($"probe", $"name"))
      .filter($"dist" <= 2)
      .select("probe", "name", "dist").as[(String, String, Int)]
      .collect().toSet
    assert(seg.length === seg.distinct.length, "each pair emitted once")
    assert(seg.toSet === brute, "segment blocking must lose no pair")
  }

  test("segment blocking equals cell blocking on a random typo corpus") {
    val rnd = new scala.util.Random(5)
    val words = Seq("olive", "navy", "powder", "misty", "chocolate", "plum")
    def name() = Seq.fill(3)(words(rnd.nextInt(words.size))).mkString(" ")
    val corpus = Seq.fill(120)(name()).distinct.toDF("name")
    val probes = Seq.fill(40)(name()).distinct.map { s =>
      val k = 1 + rnd.nextInt(s.length - 1)
      s.take(k - 1) + s.drop(k) // one deletion
    }.toDF("probe")
    val a = FuzzyJoin.editDistanceJoinSegments(corpus, probes, "name", "probe", 2)
      .select("probe", "name", "dist").as[(String, String, Int)].collect().toSet
    val b = FuzzyJoin.editDistanceJoin(corpus, probes, "name", "probe", 2)
      .select("probe", "name", "dist").as[(String, String, Int)].collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("segment blocking: duplicated strings multiply only the fan-out") {
    // both sides carry exact duplicates; results must match brute force
    // including the multiplicity (every input row pairs independently)
    val corpus = Seq("kettle", "kettle", "bottle", "bottle", "bottle", "cat")
      .toDF("name")
    val probes = Seq("ketle", "ketle", "botle", "ca").toDF("probe")
    val seg = FuzzyJoin.editDistanceJoinSegments(corpus, probes, "name", "probe", 2)
      .select("probe", "name", "dist").as[(String, String, Int)]
      .collect().sorted.toSeq
    val brute = probes.crossJoin(corpus)
      .withColumn("dist", levenshtein($"probe", $"name"))
      .filter($"dist" <= 2)
      .select("probe", "name", "dist").as[(String, String, Int)]
      .collect().sorted.toSeq
    assert(seg === brute, "duplicate rows must pair row-per-row, not collapse")
    assert(seg.count(_ == ("ketle", "kettle", 1)) === 4, "2 probes x 2 corpus")
  }
}
