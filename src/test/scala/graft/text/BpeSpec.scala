package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge replaces all non-overlapping occurrences") {
    val f = (t: Seq[String], a: String, b: String) => {
      val df = Seq(Tuple1(t)).toDF("t")
      df.select(Bpe.applyMergeUdf(df("t"),
        org.apache.spark.sql.functions.lit(a),
        org.apache.spark.sql.functions.lit(b)).as("t"))
        .as[Seq[String]].head()
    }
    assert(f(Seq("a", "b", "a", "b"), "a", "b") === Seq("a b", "a b"))
    assert(f(Seq("a", "b", "b"), "a", "b") === Seq("a b", "b"))
    assert(f(Seq("b", "a", "b"), "a", "b") === Seq("b", "a b"))
    assert(f(Seq("x", "y"), "a", "b") === Seq("x", "y"))
    assert(f(Seq("a"), "a", "b") === Seq("a"))
  }

  test("trainMerges learns the expected sequence on a toy corpus") {
    // freq-3 pairs (the,cat), (cat,sat) tie -> lexicographic tiebreak
    // picks (cat, sat); round 2 then merges (the, "cat sat") at freq 3
    val docs = (Seq.fill(3)("the cat sat") ++ Seq.fill(2)("the dog sat"))
      .toDF("text")
    val out = Bpe.trainMerges(docs, "text", 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(out === Seq(
      (1, "cat", "sat", 3L),
      (2, "the", "cat sat", 3L)))
  }

  test("merged symbols participate in later rounds") {
    // after (a,b) merges, ("a b", c) is the next most frequent pair
    val docs = Seq.fill(4)("a b c").toDF("text")
    val out = Bpe.trainMerges(docs, "text", 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(out(0) === ((1, "a", "b", 4L)))
    assert(out(1) === ((2, "a b", "c", 4L)))
  }

  test("self-pairs are never merged; training stops when exhausted") {
    val docs = Seq("x x x x", "x x").toDF("text")
    val out = Bpe.trainMerges(docs, "text", 3).collect()
    assert(out.isEmpty)
  }

  test("training is partition-invariant") {
    val docs = (1 to 50).map(i => s"tok${i % 7} tok${i % 5} tok${i % 3}")
      .toDF("text")
    val a = Bpe.trainMerges(docs.coalesce(1), "text", 4)
      .as[(Int, String, String, Long)].collect().toSeq
    val b = Bpe.trainMerges(docs.repartition(13), "text", 4)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(a === b)
    assert(a.size === 4)
  }

  test("tokenizeWithMerges applies the trained table in order") {
    val docs = Seq((1L, "a b c a b"), (2L, "c c a b")).toDF("doc_id", "text")
    val out = Bpe.tokenizeWithMerges(docs, "doc_id", "text",
        Seq(("a", "b"), ("a b", "c")))
      .orderBy("doc_id")
      .as[(Long, Seq[String], Long)].collect()
    assert(out(0) === ((1L, Seq("a b c", "a b"), 2L)))
    assert(out(1) === ((2L, Seq("c", "c", "a b"), 3L)))
  }

  test("merge frequencies are non-increasing across rounds") {
    val out = Bpe.trainMerges(
        graft.Tables.documents(spark, sf0001).limit(100), "text", 5)
      .orderBy("round")
      .as[(Int, String, String, Long)].collect()
    assert(out.nonEmpty)
    assert(out.sliding(2).forall(w => w.length < 2 || w(0)._4 >= w(1)._4),
      "a merged symbol pair can never become more frequent than the previous max")
  }
}
