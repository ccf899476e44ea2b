package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = graft.Tables.embeddings(spark, sf0001)
    .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    .cache()

  test("int8 codes: hand-computed values, clamping, zero handling") {
    val df = Seq((1L, Seq(3.0, 4.0)), (2L, Seq(-1.0, 0.0)))
      .toDF("vec_id", "v")
    val out = Similarity.quantizeInt8(df, "vec_id", "v")
      .as[(Long, Seq[Int])].collect().toMap
    // (3,4)/5 = (0.6, 0.8) → floor(76.2 + .5) = 76, floor(101.6 + .5) = 102
    assert(out(1L) === Seq(76, 102))
    // unit coordinate hits the clamp exactly; zero stays zero
    assert(out(2L) === Seq(-127, 0))
  }

  test("int8 ranking: codes bounded, top-k recall >= 0.9 vs float cosine") {
    val q = vecs.filter($"vec_id" < 10)
    // intentionally-Int decoder: int8 codes are Int in the quantized
    // vector's internal schema — not a gate output
    val (lo, hi) = Similarity.quantizeInt8(vecs, "vec_id", "v")
      .select(explode($"qv").as("c")).agg(min($"c"), max($"c"))
      .as[(Int, Int)].head()
    assert(lo >= -127 && hi <= 127, s"codes out of range: [$lo, $hi]")
    val truth = Similarity.bruteForceTopK(q, vecs, "vec_id", "v", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val got = Similarity.int8TopK(q, vecs, "vec_id", "v", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(got.length === got.distinct.length, "duplicate (query, neighbor)")
    val recall = truth.intersect(got.toSet).size.toDouble / truth.size
    assert(recall >= 0.9, s"int8 recall $recall below 0.9")
  }
}
