package graft.text

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("topTermsPerDoc ranks tf desc / df asc / term asc with corpus evidence") {
    val docs = Seq(
      (1L, "apple apple apple rare banana banana"),
      (2L, "apple banana banana cherry cherry"),
      (3L, "apple zebra"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.topTermsPerDoc(docs, "doc_id", "text", 2)
      .as[(Long, Long, String, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    assert(out.forall(_._6 === 3L), "n_docs rides along")
    val d1 = out.filter(_._1 == 1L)
    // doc 1: apple tf=3 wins; banana tf=2 beats rare tf=1
    assert(d1.map(r => (r._3, r._4, r._5)).toSeq ===
      Seq(("apple", 3L, 3L), ("banana", 2L, 2L)))
    val d2 = out.filter(_._1 == 2L)
    // doc 2: banana/cherry both tf=2 -> cherry (df=1) beats banana (df=2)
    assert(d2.map(_._3).toSeq === Seq("cherry", "banana"))
    val d3 = out.filter(_._1 == 3L)
    // doc 3: tie tf=1 -> zebra df=1 beats apple df=3
    assert(d3.map(_._3).toSeq === Seq("zebra", "apple"))
  }

  test("topTermsPerDoc is partitioning-independent") {
    val docs = (0L until 120L).map(i =>
      (i, s"w${i % 7} w${i % 7} w${i % 13} w${i % 29} filler common"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.topTermsPerDoc(docs, "doc_id", "text", 3)
      .as[(Long, Long, String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val b = TextAnalysis.topTermsPerDoc(docs.repartition(11), "doc_id", "text", 3)
      .as[(Long, Long, String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(a.sameElements(b))
    assert(a.groupBy(_._1).forall(_._2.length === 3))
  }
}
