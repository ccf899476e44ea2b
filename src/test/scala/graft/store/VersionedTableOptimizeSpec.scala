package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VersionedTableOptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-vt-opt").toString

  test("compaction packs the small-file tail, keeps big files by reference") {
    val root = tmp()
    VersionedTable.create(spark, root,
      spark.range(0, 10000).coalesce(1).select($"id".as("k")))
    for (i <- 0 until 5)  // micro-batch tail: five 10-row files
      VersionedTable.append(spark, root,
        spark.range(20000 + i * 10, 20000 + i * 10 + 10).coalesce(1)
          .select($"id".as("k")))
    val before = VersionedTable.snapshot(spark, root)
    val bigFiles = before.files.filter(_.rows >= 1000).map(_.path).toSet
    assert(before.files.count(_.rows < 1000) === 5)

    VersionedTable.optimize(spark, root, targetRows = 1000)
    val after = VersionedTable.snapshot(spark, root)
    assert(after.op === "optimize")
    assert(bigFiles.subsetOf(after.files.map(_.path).toSet),
      "files already at target size must not rewrite")
    assert(after.files.count(_.rows < 1000) === 1,
      s"5-file tail must pack into one: ${after.files.map(_.rows)}")
    // layout-only: the row multiset is untouched
    assert(VersionedTable.read(spark, root).as[Long].collect().sorted ===
      ((0L until 10000L) ++ (20000L until 20050L)).toArray)
  }

  test("zorder optimize tightens per-file manifest stats on both dimensions") {
    val root = tmp()
    // 64x64 grid laid out in b-major slabs: every file is tight on `b` but
    // spans the FULL `a` range — an `a` predicate prunes nothing
    val grid = spark.range(0, 64 * 64).select(
      ($"id" % 64).as("a"), ($"id" / 64).as("b"))
    VersionedTable.create(spark, root,
      grid.repartitionByRange(8, $"b").sortWithinPartitions("b", "a"))

    // files a predicate `a in [lo, hi]` cannot skip, per manifest stats
    def hits(lo: Long, hi: Long): Int =
      VersionedTable.snapshot(spark, root).files.count { fe =>
        (fe.mins.get("a"), fe.maxs.get("a")) match {
          case (Some(mn), Some(mx)) => mx.toLong >= lo && mn.toLong <= hi
          case _ => true
        }
      }
    val beforeFiles = VersionedTable.snapshot(spark, root).files.size
    val beforeHits = hits(8, 15)
    assert(beforeHits === beforeFiles,
      "the b-major layout must be unprunable on a")

    VersionedTable.optimize(spark, root, targetRows = 512,
      zorder = Some(("a", "b")))
    val after = VersionedTable.snapshot(spark, root)
    assert(after.files.size >= beforeFiles,
      "zorder rewrite should produce at least as many tiles")
    assert(hits(8, 15) < beforeHits,
      s"a box predicate must prune more files after zorder " +
        s"(before: $beforeHits of $beforeFiles)")
    assert(VersionedTable.read(spark, root).count() === 64L * 64)
    // stats-pruned mutations now benefit: a merge touching one tile's keys
    // rewrites a strict subset of files
    val files = after.files.map(_.path).toSet
    VersionedTable.merge(spark, root,
      Seq((0L, 0L)).toDF("a", "b"), "a")
    val untouched = VersionedTable.snapshot(spark, root).files.map(_.path).toSet
    assert((files -- untouched).nonEmpty && (files & untouched).nonEmpty,
      "merge after zorder must rewrite some files and carry others")
  }

  test("hilbert optimize prunes at least as well as the slab layout; rows preserved") {
    val root = tmp()
    val grid = spark.range(0, 64 * 64).select(
      ($"id" % 64).as("a"), ($"id" / 64).as("b"))
    VersionedTable.create(spark, root,
      grid.repartitionByRange(8, $"b").sortWithinPartitions("b", "a"))
    def hits(lo: Long, hi: Long): Int =
      VersionedTable.snapshot(spark, root).files.count { fe =>
        (fe.mins.get("a"), fe.maxs.get("a")) match {
          case (Some(mn), Some(mx)) => mx.toLong >= lo && mn.toLong <= hi
          case _ => true
        }
      }
    val beforeHits = hits(8, 15)
    VersionedTable.optimize(spark, root, targetRows = 512,
      zorder = Some(("a", "b")), curve = "hilbert")
    assert(hits(8, 15) < beforeHits,
      "an a-box predicate must prune after the hilbert rewrite")
    assert(VersionedTable.read(spark, root).count() === 64L * 64)
    // layout-only: the multiset of rows is unchanged
    assert(VersionedTable.read(spark, root).groupBy("a").count()
      .filter($"count" =!= 64).count() === 0)
  }
}
