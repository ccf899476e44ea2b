package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming exact dedup keeps one row per fingerprint within the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup").toString + "/src"
    // 3 distinct texts; "dup me" arrives three times at different ts
    Seq(
      (1L, "2024-01-01 00:00:01", "dup me"),
      (2L, "2024-01-01 00:00:02", "unique one"),
      (3L, "2024-01-01 00:00:03", "dup  me"), // normalizes to the same fp
      (4L, "2024-01-01 00:00:04", "another text"),
      (5L, "2024-01-01 00:00:05", "DUP ME"))
      .toDF("id", "ts", "text")
      .withColumn("ts", to_timestamp($"ts"))
      .write.parquet(dir)
    val stream = spark.readStream
      .schema("id long, ts timestamp, text string").parquet(dir)
    val q = Monitors.runToMemory(
      Monitors.streamingExactDedup(stream, "ts", "text"),
      "dedup_out", "append")
    try {
      val kept = spark.table("dedup_out")
        .select($"id").as[Long].collect().toSet
      // one survivor per fingerprint: {dup me (either arrival), unique, another}
      assert(kept.size === 3)
      assert(kept.contains(2L) && kept.contains(4L))
      assert((kept - 2L - 4L).subsetOf(Set(1L, 3L, 5L)))
    } finally q.stop()
  }

  test("streamingPrepare: scrubbed, token-rule filtered, one survivor per fingerprint") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sprep").toString + "/src"
    Seq(
      (1L, "a varied doc with an email pii@x.example.com inside it"),
      (2L, "a varied doc with an email pii@x.example.com inside it"), // exact dup post-scrub
      (3L, "spam spam spam spam spam spam spam spam"), // fails token rule
      (4L, "another perfectly ordinary document of words"))
      .toDF("doc_id", "text")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:01")))
      .write.parquet(dir)
    val stream = spark.readStream
      .schema("doc_id long, text string, ts timestamp").parquet(dir)
    val q = Monitors.runToMemory(
      Monitors.streamingPrepare(stream, "ts", "doc_id", "text"),
      "prep_out", "append")
    try {
      val rows = spark.table("prep_out")
        .select($"doc_id", $"text").as[(Long, String)].collect()
      val ids = rows.map(_._1).toSet
      assert(!rows.exists(_._2.contains("@")), "PII survived the stream scrub")
      assert(!ids.contains(3L), "repetition-failing doc survived")
      assert(ids.size === 2 && ids.contains(4L) &&
        ids.intersect(Set(1L, 2L)).size === 1,
        s"expected one survivor of the dup pair + doc 4, got $ids")
    } finally q.stop()
  }

  test("streaming band claims flag near-dup clusters: one full claimant per exact cluster") {
    val bands = 6
    val dir = java.nio.file.Files.createTempDirectory("graft-snear").toString + "/src"
    graft.dedup.DedupSurface.corpus(spark, sf0001)
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:01")))
      .select($"doc_id", $"ts", $"text")
      .coalesce(1)
      .write.parquet(dir)
    val stream = spark.readStream
      .schema("doc_id long, ts timestamp, text string").parquet(dir)
    val q = Monitors.runToMemory(
      Monitors.streamingBandClaims(stream, "ts", "doc_id", "text", bands),
      "band_claims", "append")
    try {
      val claims = spark.table("band_claims")
        .groupBy($"doc_id").count().as[(Long, Long)].collect().toMap
      val docs = graft.dedup.DedupSurface.corpus(spark, sf0001)
        .select($"doc_id", graft.text.TextAnalysis.normalized($"text").as("nt"))
        .as[(Long, String)].collect()
      // each band bucket has exactly ONE claimant globally (the
      // dropDuplicatesWithinWatermark invariant)
      val perKey = spark.table("band_claims")
        .groupBy($"bandKey").count().filter($"count" > 1).count()
      assert(perKey === 0)
      // identical texts share every band key -> AT MOST one member of each
      // exact-dup cluster can claim all its buckets; the others are flagged
      // (claims < bands). (Zero full claimants happens when an unrelated
      // doc's colliding bucket claimed one of the cluster's keys first —
      // still a correct near-dup flag for every member.)
      val clusters = docs.groupBy(_._2).values.filter(_.length > 1).toSeq
      assert(clusters.nonEmpty)
      clusters.foreach { members =>
        val full = members.map(m => claims.getOrElse(m._1, 0L)).count(_ == bands)
        assert(full <= 1, s"cluster ${members.map(_._1).mkString(",")}: $full full claimants")
      }
      // the dup flag actually fires: every cluster has >= size-1 flagged members
      val flagged = clusters.map(members =>
        members.map(m => claims.getOrElse(m._1, 0L)).count(_ < bands))
      clusters.zip(flagged).foreach { case (members, f) =>
        assert(f >= members.length - 1)
      }
      // every doc is accounted for: claimed buckets never exceed its bands
      claims.values.foreach(n => assert(n <= bands))
    } finally q.stop()
  }
}
