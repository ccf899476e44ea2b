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

  test("nprobe > 1 recovers planted near-neighbors (recall >= 0.95 at nprobe=4)") {
    // plant TRUE near-neighbors: 5 tiny-perturbation copies of each of 40
    // query vectors (cos ≈ 0.999 vs ~0.2 for random pairs), so brute-force
    // top-5 is exactly the planted set. A copy lands in its source's home
    // list unless the source sits near a centroid boundary — those are the
    // neighbors single-probe loses and nprobe recovers (real IVF recall).
    val k = 5
    val bases = vecs.filter($"vec_id" < 40)
      .as[(Long, Seq[Double])].collect()
    val copies = bases.flatMap { case (id, v) =>
      (0 until k).map { j =>
        (100000L + id * 10 + j, v.updated(j, v(j) + 0.02 * (j + 1)))
      }
    }.toSeq.toDF("vec_id", "v")
    val corpus = vecs.unionByName(copies).cache()
    val queries = vecs.filter($"vec_id" < 40).cache()
    val trained = Similarity.trainCentroids(corpus, "vec_id", "v", 8, iters = 2)
      .select($"cid".as("vec_id"), $"cv".as("v"))
    val truth = Similarity.bruteForceTopK(queries, corpus, "vec_id", "v", k)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def recall(nprobe: Int): Double = {
      val got = Similarity.ivfTopK(queries, corpus, trained, "vec_id", "v", k, nprobe)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      // no (query, neighbor) pair may arise twice — a corpus vector lives
      // in exactly one inverted list
      assert(got.length === got.distinct.length)
      got.toSet.intersect(truth).size.toDouble / truth.size
    }
    val r1 = recall(1)
    val r4 = recall(4)
    assert(r4 >= r1, s"nprobe=4 recall $r4 below nprobe=1 recall $r1")
    assert(r4 >= 0.95, s"nprobe=4 recall $r4 below 0.95")
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
