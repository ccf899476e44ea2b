package graft.text

import graft.SparkSpec

class ImportanceSamplerSpec extends SparkSpec {
  import spark.implicits._

  test("importance weights rank target-like docs above off-distribution ones") {
    val target = Seq(
      (101L, "the model trains on clean data every day"),
      (102L, "clean data makes the model happy and sharp"),
      (103L, "the model likes clean data and clean text"),
    ).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "the model trains on clean data and clean text"),  // on-target
      (2L, "zzz qqq xxx vvv kkk jjj ppp www"),                // gibberish
      (3L, "clean data every day makes the model sharp"),     // on-target
      (4L, "completely unrelated cooking recipe with yeast dough and flour"),
    ).toDF("doc_id", "text")

    val w = ImportanceSampler.importanceWeights(raw, target, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(w.keySet === Set(1L, 2L, 3L, 4L), "every raw doc must be scored")
    assert(w(1L) > w(2L) && w(3L) > w(2L),
      s"on-target docs must outweigh gibberish: $w")
    assert(w(1L) > w(4L) && w(3L) > w(4L),
      s"on-target docs must outweigh off-domain text: $w")

    val selected = ImportanceSampler.dsirSelect(raw, target, "doc_id", "text", 2)
      .select("doc_id").as[Long].collect().toSet
    assert(selected === Set(1L, 3L))
  }

  test("unseen bigrams smooth to defined scores (no dropped docs, no nulls)") {
    val target = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    val raw = Seq((1L, "totally novel words here")).toDF("doc_id", "text")
    val w = ImportanceSampler.importanceWeights(raw, target, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
    assert(w.length === 1 && w.head._2 === 3L)  // 3 bigrams, all unseen
  }
}
