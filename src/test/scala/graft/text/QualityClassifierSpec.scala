package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = Seq(
    (1L, "the cat and the dog is here and the end is near", "en"),
    (2L, "the quick fox and the lazy dog is fast and the sun is up", "en"),
    (3L, "le chat et le chien sont ici toujours ensemble", "fr"),
    (4L, "el gato y el perro que corren juntos siempre", "es"),
    (5L, "the bird and the fish is small and the pond is deep", "en"),
    (6L, "der hund und die katze laufen durch den park heute", "de"),
  ).toDF("doc_id", "text", "lang")

  test("features are exact grid integers") {
    val f = QualityClassifier.features(
      Seq((1L, "the cat and the dog is big", "en")).toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang", "en")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // 7 tokens; " the "x2 " and "x1 " is "x1 = 4 hits; 20 chars sans spaces
    assert(f === ((1L, 1L, 1000000L, 70000L,
      math.floor(4.0 * 1e6 / 7.0).toLong,
      math.floor(20.0 * 1e6 / (20.0 * 7.0)).toLong)))
  }

  test("GD training separates the classes and is partition-independent") {
    val feats = QualityClassifier.features(corpus(), "doc_id", "text", "lang", "en")
    val w = QualityClassifier.train(feats)
    assert(QualityClassifier.train(feats.repartition(7)).toSeq === w.toSeq,
      "training must be bit-exact under any partitioning")

    val scores = QualityClassifier.scoreWith(feats, w)
      .as[(Long, Long, Long)].collect()
    val pos = scores.filter(_._2 == 1L).map(_._3.toDouble)
    val neg = scores.filter(_._2 == 0L).map(_._3.toDouble)
    assert(pos.sum / pos.length > neg.sum / neg.length,
      s"mean positive score must exceed mean negative: $pos vs $neg")
    // 4 rounds from zero weights must have moved off the 0.5 prior
    assert(w.exists(_ != 0L))
  }
}
