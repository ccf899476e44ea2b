package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted dedup indexes: parquet round-trip parity with the in-memory
  * rebuild paths, exactly-once appends, and append ≡ rebuild result
  * equality (the contract the `dedup_*_indexed` gates rest on).
  */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val corpus = docs(
    1L -> "the quick brown fox jumps over the lazy dog near the river bank",
    2L -> "a completely different document about distributed query engines",
    3L -> "the quick brown fox jumps over the lazy dog near the river bank",
    4L -> "columnar storage formats amortize scan cost across wide tables",
    5L -> "partition pruning and predicate pushdown keep scans proportional")

  private val batch = docs(
    11L -> "the quick brown fox jumps over the lazy dog near the river edge",
    12L -> "a completely different document about distributed query engines",
    13L -> "an entirely fresh topic unseen anywhere in the corpus before now",
    14L -> "an entirely fresh topic unseen anywhere in the corpus before now")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/ix"

  private def pairsOf(d: DataFrame): Set[(Long, Long, Double)] =
    d.select(col("doc_a"), col("doc_b"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet

  private def survivorsOf(d: DataFrame): Set[(Long, Long)] =
    d.select(col("doc_id"), col("survivor_id"))
      .as[(Long, Long)].collect().toSet

  test("band index round-trips: persisted-index dedup ≡ in-memory dedupAgainst") {
    val dir = tmp("graft-bandix")
    DedupIndex.buildBand(corpus, "doc_id", "text", dir)
    val viaIndex = DedupIndex.dedupBatch(spark, dir, batch, "doc_id", "text", 0.5)
    val direct = Dedup.dedupAgainst(corpus, batch, "doc_id", "text", 0.5)
    assert(survivorsOf(viaIndex) === survivorsOf(direct))
    // every batch doc is mapped; corpus matches elected (11->1, 12->2),
    // fresh docs cluster among themselves (13/14 -> 13)
    val m = survivorsOf(viaIndex).toMap
    assert(m(11L) === 1L && m(12L) === 2L && m(13L) === 13L && m(14L) === 13L)
  }

  test("band append is exactly-once and ≡ a rebuild over corpus ∪ appended") {
    val dir = tmp("graft-bandapp")
    DedupIndex.buildBand(corpus, "doc_id", "text", dir)
    val day1 = docs(21L -> "brand new day one text with its own unique shingle set",
      22L -> "a completely different document about distributed query engines")
    assert(DedupIndex.appendBand(spark, dir, day1, "doc_id", "text", "day-1"))
    assert(!DedupIndex.appendBand(spark, dir, day1, "doc_id", "text", "day-1"),
      "replayed tag must be refused")
    val day2 = docs(31L -> "brand new day one text with its own unique shingle set")
    val viaAppended = DedupIndex.dedupBatch(spark, dir, day2, "doc_id", "text", 0.5)
    val viaRebuild = Dedup.dedupAgainst(corpus.unionByName(day1), day2,
      "doc_id", "text", 0.5)
    assert(survivorsOf(viaAppended) === survivorsOf(viaRebuild))
    assert(survivorsOf(viaAppended) === Set(31L -> 21L))
  }

  test("prefix index round-trips: persisted ppjoinBatch ≡ in-memory ppjoinAgainst") {
    val dir = tmp("graft-prefix")
    DedupIndex.buildPrefix(corpus, "doc_id", "text", dir, 0.5)
    assert(DedupIndex.prefixThreshold(dir) === 0.5)
    val viaIndex = DedupIndex.ppjoinBatch(spark, dir, batch, "doc_id", "text")
    val direct = Dedup.ppjoinAgainst(
      Dedup.prefixIndex(corpus, "doc_id", "text", 0.5),
      batch, "doc_id", "text", 0.5)
    assert(pairsOf(viaIndex) === pairsOf(direct))
    assert(pairsOf(viaIndex).map(p => (p._1, p._2)) ===
      Set((1L, 11L), (3L, 11L), (2L, 12L), (13L, 14L)))
  }

  test("prefix append: pair set over grown index ≡ exact rebuild (both zero-miss)") {
    val dir = tmp("graft-prefixapp")
    DedupIndex.buildPrefix(corpus, "doc_id", "text", dir, 0.5)
    val day1 = docs(
      21L -> "the quick brown fox jumps over the lazy dog near the river edge",
      22L -> "some day one content that matches nothing else in this corpus")
    assert(DedupIndex.appendPrefix(spark, dir, day1, "doc_id", "text", "day-1"))
    assert(!DedupIndex.appendPrefix(spark, dir, day1, "doc_id", "text", "day-1"))
    val day2 = docs(
      31L -> "some day one content that matches nothing else in this corpus",
      32L -> "the quick brown fox jumps over the lazy dog near the river bank")
    val viaAppended = DedupIndex.ppjoinBatch(spark, dir, day2, "doc_id", "text")
    // rebuild twin: index over corpus ∪ day1 at the same τ — candidate sets
    // may differ (df stats shift) but both algorithms are exact, so the
    // verified pair sets must be identical
    val viaRebuild = Dedup.ppjoinAgainst(
      Dedup.prefixIndex(corpus.unionByName(day1), "doc_id", "text", 0.5),
      day2, "doc_id", "text", 0.5)
    assert(pairsOf(viaAppended) === pairsOf(viaRebuild))
    val ids = pairsOf(viaAppended).map(p => (p._1, p._2))
    assert(ids.contains((22L, 31L)) && ids.contains((3L, 32L)) &&
      ids.contains((1L, 32L)) && ids.contains((21L, 32L)))
  }

  test("mid-append reader sees none-or-all: support-first commit order") {
    val dir = tmp("graft-prefixmid")
    DedupIndex.buildPrefix(corpus, "doc_id", "text", dir, 0.5)
    val day1 = docs( // an exact-dup family within the day's batch
      21L -> "the quick brown fox jumps over the lazy dog near the river edge",
      22L -> "the quick brown fox jumps over the lazy dog near the river edge")
    // replicate appendPrefix's exact sub-steps, pausing a concurrent
    // ppjoinBatch reader between each sub-table commit — the daily-ingest
    // overlap the support-first (members -> grams -> prefix-last) order
    // exists for: the reader must see either NONE of the batch's families
    // (append invisible) or ALL the support its candidates need
    val ix0 = DedupIndex.loadPrefix(spark, dir)
    val (bg, bprefix, bmembers) =
      Dedup.ppjoinBatchSide(ix0, day1, "doc_id", "text", 0.5)
    val probe =
      docs(31L -> "the quick brown fox jumps over the lazy dog near the river edge")
    def readerIds(): Set[(Long, Long)] =
      pairsOf(DedupIndex.ppjoinBatch(spark, dir, probe, "doc_id", "text"))
        .map(p => (p._1, p._2))
    val before = readerIds()
    assert(before === Set((1L, 31L), (3L, 31L)))
    import graft.store.VersionedTable
    assert(VersionedTable.appendBatch(spark, s"$dir/members", bmembers, "day-1"))
    assert(readerIds() === before,
      "members committed, prefix absent: the append must be invisible")
    assert(VersionedTable.appendBatch(spark, s"$dir/grams", bg, "day-1"))
    assert(readerIds() === before,
      "members+grams committed, prefix absent: the append must be invisible")
    assert(VersionedTable.appendBatch(spark, s"$dir/prefix", bprefix, "day-1"))
    assert(readerIds() === before ++ Set((21L, 31L), (22L, 31L)),
      "prefix committed last: the whole family is visible, fully supported")
    // the composed verb replays the same tag as a no-op
    assert(!DedupIndex.appendPrefix(spark, dir, day1, "doc_id", "text", "day-1"))
  }

  test("loads fail loudly on missing or mismatched indexes") {
    val none = tmp("graft-noix")
    intercept[IllegalArgumentException](DedupIndex.loadBand(spark, none))
    val dir = tmp("graft-kindmix")
    DedupIndex.buildBand(corpus, "doc_id", "text", dir)
    intercept[IllegalArgumentException](DedupIndex.loadPrefix(spark, dir))
    // a v1 artifact's meta has no "v" field at all — the version must
    // default (not throw) so the curated migration error actually fires
    val v1 = tmp("graft-v1meta")
    new java.io.File(v1).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(v1, "_meta.json"),
      """{"kind":"prefix","threshold":0.5}""")
    val e = intercept[IllegalArgumentException](DedupIndex.loadPrefix(spark, v1))
    assert(e.getMessage.contains("predates the collapsed v2 format"))
  }
}
