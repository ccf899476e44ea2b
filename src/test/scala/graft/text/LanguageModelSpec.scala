package graft.text

import graft.SparkSpec

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a b"),
    (2L, "a b"),
    (3L, "z q a"),
    (4L, "solo"),                       // no bigram → excluded
    (5L, ""),                           // excluded
    (6L, null.asInstanceOf[String]))    // excluded
    .toDF("doc_id", "text")

  test("bigram LM score matches the hand-derived Laplace model") {
    // corpus stats: c12(a,b)=3, c12(b,a)=1, c12(z,q)=1, c12(q,a)=1;
    // c1(a)=3, c1(b)=c1(z)=c1(q)=1; V=5 ("solo" is vocab even though its
    // doc carries no bigram)
    def q(c12: Long, c1: Long): Long =
      math.floor(math.log((c12 + 1.0) / (c1 + 5.0)) * 1000000.0).toLong
    val ab = q(3, 3); val ba = q(1, 1); val zq = q(1, 1); val qa = q(1, 1)
    def avg(sum: Long, n: Long): Long =
      math.floor(sum.toDouble / n.toDouble).toLong
    val expected = Map(
      1L -> (3L, 2 * ab + ba, avg(2 * ab + ba, 3)),
      2L -> (1L, ab, ab),
      3L -> (2L, zq + qa, avg(zq + qa, 2)))
    val out = LanguageModel.score(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out === expected)
  }

  test("common-bigram docs score above rare-bigram docs") {
    val out = LanguageModel.score(docs, "doc_id", "text")
      .select($"doc_id", $"lm_avg_q").as[(Long, Long)].collect().toMap
    assert(out(1L) > out(3L),
      "the doc of corpus-frequent bigrams must out-score the rare one")
  }

  test("ccnet buckets tercile each language by score, monotone and partition-independent") {
    // 9 en docs with a graded mix of corpus-common and rare bigrams, plus a
    // de group small enough to exercise the ceil boundaries (n=3).
    val corpus = (
      (1L to 9L).map(i =>
        (i, "en", (Seq.fill((10 - i).toInt)("a b") ++ Seq.fill(i.toInt)(s"r$i x$i")).mkString(" "))) ++
      Seq((21L, "de", "u v u v u v"), (22L, "de", "u v w z"), (23L, "de", "w z y t"))
    ).toDF("doc_id", "lang", "text")
    val out = LanguageModel.ccnetBuckets(corpus, "doc_id", "lang", "text")
      .select($"doc_id", $"lang", $"lm_avg_q", $"bucket")
      .as[(Long, String, Long, String)].collect()
    assert(out.length === 12, "every scored doc is labeled exactly once")
    // buckets are value-monotone within each language
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val byBucket = rows.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      assert(byBucket.keySet === Set("head", "middle", "tail"), s"$lang: $byBucket")
      assert(byBucket("head").min > byBucket("middle").max, s"$lang head>middle")
      assert(byBucket("middle").min > byBucket("tail").max, s"$lang middle>tail")
    }
    // de (n=3) splits 1/1/1 at the exact ceil ranks
    assert(out.filter(_._2 == "de").groupBy(_._4).view.mapValues(_.length).toMap
      === Map("head" -> 1, "middle" -> 1, "tail" -> 1))
    // labeling is independent of input partitioning
    val repart = LanguageModel.ccnetBuckets(corpus.repartition(7), "doc_id", "lang", "text")
      .select($"doc_id", $"bucket").as[(Long, String)].collect().toSet
    assert(repart === out.map(r => (r._1, r._4)).toSet)
  }
}
