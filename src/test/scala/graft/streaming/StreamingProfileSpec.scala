package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.analytics.Profile
import graft.store.VersionedTable

/** Stream ≡ batch parity for the incremental profile: the snapshot after
  * N micro-batches must equal [[Profile.profileSketch]] over the union —
  * counts, min/max (numeric AND lexicographic kinds), and the HLL
  * estimate columns bit-for-bit (register MAX-merge is order-free).
  */
class StreamingProfileSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select($"column", $"n_rows", $"n_nulls", $"present", $"t_sum",
        $"est", $"min_value", $"max_value")
      .as[(String, Long, Long, Long, Long, Double, Option[String], Option[String])]
      .collect().toSet

  test("streaming profile snapshot equals the one-shot sketch profile EXACTLY") {
    // documents has string, numeric, and null-bearing columns; slice by
    // doc_id so batches carry different min/max and distinct sets.
    // doc_id 9 < 10 lexicographically-reversed ("10" < "9") exercises the
    // numeric-kind merge.
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    val srcDir = Files.createTempDirectory("graft-sprof-src").toString + "/src"
    (0 until 3).foreach { i =>
      docs.filter($"doc_id" % 3 === i).coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    val root = Files.createTempDirectory("graft-sprof-tbl").toString
    val ckpt = Files.createTempDirectory("graft-sprof-ck").toString
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)

    val q = StreamingProfile.start(stream, root, ckpt)
    try q.processAllAvailable() finally q.stop()

    val streamed = rows(StreamingProfile.snapshot(spark, root))
    val oneShot = rows(Profile.profileSketch(docs))
    assert(streamed === oneShot)
    // sanity on the merge semantics: doc_id min/max are numeric-merged
    val byCol = streamed.map(r => r._1 -> r).toMap
    assert(byCol("doc_id")._7.get.toLong ===
      docs.agg(min($"doc_id")).as[Long].head())
    assert(byCol("doc_id")._8.get.toLong ===
      docs.agg(max($"doc_id")).as[Long].head())

    // exactly-once: replaying a committed micro-batch changes nothing
    val vBefore = VersionedTable.latestVersion(spark, s"$root/parts")
    StreamingProfile.processBatch(
      docs.filter($"doc_id" % 3 === 0), root, 0L)
    assert(VersionedTable.latestVersion(spark, s"$root/parts") === vBefore)
    assert(rows(StreamingProfile.snapshot(spark, root)) === oneShot)
    // one commit per trigger (plus the one-time create): 3 batches → 4
    // versions; the old two-table layout paid 2 commits per trigger
    assert(vBefore === Some(4L))
  }
}
