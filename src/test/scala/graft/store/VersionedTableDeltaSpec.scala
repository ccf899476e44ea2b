package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The incremental-manifest contract: commit JSON is O(touched files), not
  * O(table); checkpoints land on the [[VersionedTable.CheckpointInterval]]
  * cadence and bound replay; vacuum keeps the oldest retained version
  * reconstructible after dropping its ancestor deltas. This is the 100 TB
  * commit-cost story — at ~10^6 files a full-snapshot manifest per commit
  * would serialize hundreds of MB of JSON per append.
  */
class VersionedTableDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-vtd").toString

  private def logSizes(root: String): Map[String, Long] = {
    val dir = new java.io.File(root, "_log")
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filterNot(_.getName.startsWith("."))
      .map(f => f.getName -> f.length()).toMap
  }

  test("delta manifests stay flat-sized as the table grows; checkpoints land every Nth commit") {
    val root = tmp()
    VersionedTable.create(spark, root,
      Seq((0L, "seed")).toDF("k", "s").coalesce(1))
    val appends = 25
    for (i <- 1 to appends)
      VersionedTable.append(spark, root,
        Seq((i.toLong, s"row$i")).toDF("k", "s").coalesce(1))
    assert(VersionedTable.latestVersion(spark, root) === Some(appends + 1L))

    val sizes = logSizes(root)
    val deltaSizes = sizes.collect {
      case (n, len) if n.matches("v\\d{20}\\.json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong -> len
    }.toSeq.sortBy(_._1)
    // every append adds exactly one file: the delta for append #25 must be
    // the same size class as the delta for append #2 — O(1), not O(table).
    // (2x headroom absorbs stats-string length variation.)
    val first = deltaSizes(1)._2.toDouble
    val last = deltaSizes.last._2.toDouble
    assert(last <= 2.0 * first,
      s"commit manifest grew with table size: first append $first B, " +
        s"last append $last B")
    // a snapshot at the head sees all 26 files regardless
    assert(VersionedTable.snapshot(spark, root).files.length === appends + 1)
    assert(VersionedTable.read(spark, root).count() === appends + 1L)

    // checkpoints at every CheckpointInterval-th version, none elsewhere
    val cps = sizes.keys.filter(_.matches("v\\d{20}\\.checkpoint\\.json"))
      .map(_.stripPrefix("v").stripSuffix(".checkpoint.json").toLong).toSeq.sorted
    val n = VersionedTable.CheckpointInterval
    assert(cps === (n to (appends + 1L) by n).toSeq)
    // a checkpoint carries the full state: strictly larger than the last
    // single-file delta once the table holds many files
    val cpLen = sizes(f"v${appends + 1L - (appends + 1L) % n}%020d.checkpoint.json")
    assert(cpLen > deltaSizes.last._2)
  }

  test("time travel reconstructs every version exactly across checkpoint boundaries") {
    val root = tmp()
    VersionedTable.create(spark, root, Seq((1L, "a")).toDF("k", "s").coalesce(1))
    for (i <- 2 to 23)
      VersionedTable.append(spark, root,
        Seq((i.toLong, "x")).toDF("k", "s").coalesce(1))
    // version v holds exactly v rows (one per commit) — check versions
    // below, at, and above each checkpoint boundary
    for (v <- Seq(1L, 9L, 10L, 11L, 19L, 20L, 21L, 23L))
      assert(VersionedTable.read(spark, root, Some(v)).count() === v,
        s"at version $v")
  }

  test("removes replay correctly: overwrite, merge and delete through the delta log") {
    val root = tmp()
    VersionedTable.create(spark, root,
      spark.range(0, 100).select($"id".as("k"), lit("old").as("s")))
    VersionedTable.merge(spark, root,
      spark.range(50, 120).select($"id".as("k"), lit("new").as("s")), "k")
    VersionedTable.deleteByKeys(spark, root,
      spark.range(0, 10).select($"id".as("k")), "k")
    val rows = VersionedTable.read(spark, root)
    assert(rows.count() === 110)
    assert(rows.filter($"s" === "new").count() === 70)
    // the delete's delta must not re-list the merge's surviving adds
    val s3 = VersionedTable.snapshot(spark, root, Some(3L))
    val s2 = VersionedTable.snapshot(spark, root, Some(2L))
    assert(s3.files.map(_.path).toSet !== s2.files.map(_.path).toSet)
    VersionedTable.overwrite(spark, root, Seq((1L, "z")).toDF("k", "s"))
    assert(VersionedTable.read(spark, root).count() === 1)
    assert(VersionedTable.read(spark, root, Some(3L)).count() === 110,
      "overwrite must not disturb the pinned prior version")
  }

  test("vacuum drops ancestor deltas but keeps retained versions reconstructible") {
    val root = tmp()
    VersionedTable.create(spark, root, Seq((1L, "a")).toDF("k", "s").coalesce(1))
    for (i <- 2 to 7)
      VersionedTable.append(spark, root,
        Seq((i.toLong, "x")).toDF("k", "s").coalesce(1))
    // no checkpoint exists yet (interval 10): vacuum must materialize one
    // at the oldest retained version before dropping deltas 1..5
    VersionedTable.vacuum(spark, root, retainVersions = 2)
    assert(VersionedTable.read(spark, root, Some(6L)).count() === 6)
    assert(VersionedTable.read(spark, root, Some(7L)).count() === 7)
    val err = intercept[IllegalArgumentException] {
      VersionedTable.read(spark, root, Some(5L))
    }
    assert(err.getMessage.contains("vacuumed"))
    val names = logSizes(root).keys.toSeq
    assert(names.exists(_.matches("v0*6\\.checkpoint\\.json")),
      s"vacuum must checkpoint the oldest retained version, have $names")
  }

  test("vacuum aborts before deleting anything when the checkpoint cannot be written") {
    val root = tmp()
    VersionedTable.create(spark, root, Seq((1L, "a")).toDF("k", "s").coalesce(1))
    for (i <- 2 to 7)
      VersionedTable.append(spark, root,
        Seq((i.toLong, "x")).toDF("k", "s").coalesce(1))
    val logDir = new java.io.File(root, "_log")
    val before = Option(logDir.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filterNot(_.startsWith(".")).toSet
    // make the checkpoint write fail silently (writeCheckpoint swallows IO
    // errors by design — disk full, permissions, transient store fault):
    // vacuum MUST verify durability and abort — were it to proceed, deltas
    // 1..5 would be deleted with no checkpoint at 6 and versions 6-7 would
    // become unreconstructible
    VersionedTable.failCheckpointWritesForTests = true
    try {
      val err = intercept[IllegalArgumentException] {
        VersionedTable.vacuum(spark, root, retainVersions = 2)
      }
      assert(err.getMessage.contains("could not be written durably"))
    } finally VersionedTable.failCheckpointWritesForTests = false
    val after = Option(logDir.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filterNot(_.startsWith(".")).toSet
    assert(after === before, "aborted vacuum must not delete any log file")
    assert(VersionedTable.read(spark, root, Some(3L)).count() === 3)
    assert(VersionedTable.read(spark, root).count() === 7)
    // and the recovery path still works once the dir is writable again
    VersionedTable.vacuum(spark, root, retainVersions = 2)
    assert(VersionedTable.read(spark, root).count() === 7)
  }

  test("snapshot fails loudly on a truncated log with no surviving checkpoint") {
    val root = tmp()
    VersionedTable.create(spark, root, Seq((1L, "a")).toDF("k", "s").coalesce(1))
    for (i <- 2 to 7)
      VersionedTable.append(spark, root,
        Seq((i.toLong, "x")).toDF("k", "s").coalesce(1))
    VersionedTable.vacuum(spark, root, retainVersions = 2)
    // externally lose the checkpoint vacuum materialized at v6, and start
    // cold (the warm snapshot cache is what hides this in-process): the
    // remaining deltas 6..7 are a suffix with no genesis — a replay from
    // them alone would silently drop files committed in versions 1..5
    val cp = Option(new java.io.File(root, "_log").listFiles())
      .getOrElse(Array.empty).find(_.getName.endsWith(".checkpoint.json"))
    assert(cp.isDefined && cp.get.delete())
    VersionedTable.resetSnapshotCacheForTests()
    val err = intercept[IllegalArgumentException] {
      VersionedTable.read(spark, root)
    }
    assert(err.getMessage.contains("cannot reconstruct a complete snapshot"))
  }

  test("snapshot fails loudly on a MID-chain gap even when genesis survives") {
    val root = tmp()
    VersionedTable.create(spark, root, Seq((1L, "a")).toDF("k", "s").coalesce(1))
    for (i <- 2 to 5)
      VersionedTable.append(spark, root,
        Seq((i.toLong, "x")).toDF("k", "s").coalesce(1))
    // externally lose a delta in the MIDDLE of the chain: the log still
    // starts at genesis (v1), so the old head-only guard passed and the
    // replay silently skipped v3's adds — a partial file list
    assert(new java.io.File(root, "_log/v%020d.json".format(3L)).delete())
    VersionedTable.resetSnapshotCacheForTests()
    val err = intercept[IllegalArgumentException] {
      VersionedTable.read(spark, root)
    }
    assert(err.getMessage.contains("not contiguous"))
    // versions at or before the gap still reconstruct
    VersionedTable.resetSnapshotCacheForTests()
    assert(VersionedTable.read(spark, root, Some(2L)).count() === 2)
  }

  test("appendBatch tag refusal survives checkpoint-based reconstruction") {
    val root = tmp()
    VersionedTable.create(spark, root, Seq((0L, "s")).toDF("k", "s").coalesce(1))
    for (i <- 1 to 12)
      assert(VersionedTable.appendBatch(spark, root,
        Seq((i.toLong, "x")).toDF("k", "s").coalesce(1), s"batch-$i"))
    // tags from before the v10 checkpoint must still refuse after it
    assert(!VersionedTable.appendBatch(spark, root,
      Seq((99L, "dup")).toDF("k", "s").coalesce(1), "batch-3"))
    assert(!VersionedTable.appendBatch(spark, root,
      Seq((99L, "dup")).toDF("k", "s").coalesce(1), "batch-12"))
    assert(VersionedTable.read(spark, root).count() === 13)
  }
}
