package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def applyBatch(t: Seq[String], batch: Seq[(String, String)]): Seq[String] = {
    val df = Seq(Tuple1(t)).toDF("t")
    df.select(Bpe.applyMergesUdf(df("t"),
      org.apache.spark.sql.functions.typedLit(batch.map(_._1)),
      org.apache.spark.sql.functions.typedLit(batch.map(_._2))).as("t"))
      .as[Seq[String]].head()
  }

  test("applyMerges replaces all non-overlapping occurrences (single pair)") {
    val ab = Seq(("a", "b"))
    assert(applyBatch(Seq("a", "b", "a", "b"), ab) === Seq("a b", "a b"))
    assert(applyBatch(Seq("a", "b", "b"), ab) === Seq("a b", "b"))
    assert(applyBatch(Seq("b", "a", "b"), ab) === Seq("b", "a b"))
    assert(applyBatch(Seq("x", "y"), ab) === Seq("x", "y"))
    assert(applyBatch(Seq("a"), ab) === Seq("a"))
  }

  test("a batch applies simultaneously, not sequentially") {
    // disjoint pairs merge side by side in one scan
    assert(applyBatch(Seq("a", "b", "c", "d"), Seq(("a", "b"), ("c", "d")))
      === Seq("a b", "c d"))
    // simultaneity matters: ("a b", "c") must NOT consume the "a b" the
    // same batch just produced (a sequential fold would yield ["a b c"])
    assert(applyBatch(Seq("a", "b", "c"), Seq(("a", "b"), ("a b", "c")))
      === Seq("a b", "c"))
  }

  test("selectBatch keeps pairs disjoint from every higher-ranked candidate") {
    val top = Seq(
      ("cat", "sat", 3L), // rank 1: kept
      ("the", "cat", 3L), // shares cat with rank 1: dropped
      ("dog", "sat", 2L), // shares sat with rank 1: dropped
      ("the", "dog", 2L), // shares the/dog with DROPPED candidates: still dropped (one-shot rule)
      ("up", "down", 1L)) // disjoint from all above: kept
    assert(Bpe.selectBatch(top) === Seq(("cat", "sat", 3L), ("up", "down", 1L)))
  }

  test("trainMerges learns batched rounds on a toy corpus") {
    // round 1: (cat,sat) and (the,cat) tie at 3 — lexicographic rank keeps
    // (cat,sat) and its conflicts drop; round 2 then merges
    // (the,"cat sat") at 3 AND the now-conflict-free (dog,sat) at 2 in the
    // same batch — the decoupling batching exists for
    val docs = (Seq.fill(3)("the cat sat") ++ Seq.fill(2)("the dog sat"))
      .toDF("text")
    val out = Bpe.trainMerges(docs, "text", 2)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(out === Seq(
      (1, "cat", "sat", 3L),
      (2, "the", "cat sat", 3L),
      (2, "dog", "sat", 2L)))
  }

  test("merged symbols participate in later rounds") {
    // (a,b) and (b,c) conflict, so round 1 merges only (a,b); the merged
    // symbol then pairs with c in round 2
    val docs = Seq.fill(4)("a b c").toDF("text")
    val out = Bpe.trainMerges(docs, "text", 2)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(out === Seq(
      (1, "a", "b", 4L),
      (2, "a b", "c", 4L)))
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
      .as[(Long, String, String, Long)].collect().toSeq
    val b = Bpe.trainMerges(docs.repartition(13), "text", 4)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("tokenizeWithMerges applies the trained batches in round order") {
    val docs = Seq((1L, "a b c a b"), (2L, "c c a b")).toDF("doc_id", "text")
    val out = Bpe.tokenizeWithMerges(docs, "doc_id", "text",
        Seq(Seq(("a", "b")), Seq(("a b", "c"))))
      .orderBy("doc_id")
      .as[(Long, Seq[String], Long)].collect()
    assert(out(0) === ((1L, Seq("a b c", "a b"), 2L)))
    assert(out(1) === ((2L, Seq("c", "c", "a b"), 3L)))
  }

  test("per-round max merge frequency is non-increasing across rounds") {
    val out = Bpe.trainMerges(
        graft.Tables.documents(spark, sf0001).limit(100), "text", 3)
      .as[(Long, String, String, Long)].collect()
    assert(out.nonEmpty)
    // batching target: more than one merge learned per pair-count shuffle
    assert(out.length > out.map(_._1).distinct.length,
      s"expected batched rounds, got ${out.length} merges in ${out.map(_._1).distinct.length} rounds")
    val roundMax = out.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.map(_._4).max)
    assert(roundMax.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
      "merging can never raise the global max pair count")
  }
}
