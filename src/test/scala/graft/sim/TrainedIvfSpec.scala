package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainedIvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = graft.Tables.embeddings(spark, sf0001)
    .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    .cache()

  test("Lloyd iterations improve the codebook and keep it intact") {
    val k = 8
    val c0 = Similarity.trainCentroids(vecs, "vec_id", "v", k, iters = 0)
    val c3 = Similarity.trainCentroids(vecs, "vec_id", "v", k, iters = 3)
    assert(c0.count() === k && c3.count() === k)
    // centroids keep full dimensionality
    assert(c3.select(size($"cv")).distinct().as[Int].collect().toSeq === Seq(64))
    val obj0 = Similarity.assignmentObjective(vecs, c0, "vec_id", "v")
    val obj3 = Similarity.assignmentObjective(vecs, c3, "vec_id", "v")
    // training must beat the naive lowest-id init codebook
    assert(obj3 > obj0, s"trained $obj3 <= naive $obj0")
  }

  test("trained codebook slots into ivfTopK and returns sane neighbors") {
    val trained = Similarity.trainCentroids(vecs, "vec_id", "v", 8, iters = 2)
      .select($"cid".as("vec_id"), $"cv".as("v"))
    val queries = vecs.filter($"vec_id" < 5)
    val res = Similarity.ivfTopK(queries, vecs, trained, "vec_id", "v", 5)
    val byQuery = res.select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    assert(byQuery.size === 5)
    // ranks are 1..n contiguous per query and never exceed k
    byQuery.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
      assert(rows.length <= 5)
    }
  }
}
