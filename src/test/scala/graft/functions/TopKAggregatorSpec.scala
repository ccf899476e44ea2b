package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sim.Similarity

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("heap top-k equals the window row_number form on the ANN workload") {
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val queries = vecs.filter($"vec_id" < 5)
    // window/full-sort form (the existing gate query path)
    val viaWindow = Similarity.bruteForceTopK(queries, vecs, "vec_id", "v", 10)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Long)].collect().toSet
    // bounded-heap partial-aggregate form
    val scored = vecs.select($"vec_id".as("neighbor_id"), $"v".as("nv"))
      .join(broadcast(queries.select($"vec_id".as("query_id"), $"v".as("qv"))),
        $"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id",
        CosineSimilarity.cosineSim($"qv", $"nv").as("cos"))
      .as[(Long, Long, Double)]
    val agg = new TopKAggregator(10).toColumn
    val viaHeap = scored
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg)
      .flatMap { case (q, top) =>
        top.zipWithIndex.map { case ((id, _), i) => (q, id, (i + 1).toLong) }
      }
      .collect().toSet
    assert(viaHeap === viaWindow)
  }

  test("ties break toward the lower id, matching the window convention") {
    val data = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0), (4L, 1.0)).toDS()
    val top = new TopKAggregator(2)
    val buf = data.collect().foldLeft(top.zero)(top.reduce)
    assert(top.finish(buf).map(_._1) === Seq(1L, 2L))
  }
}
