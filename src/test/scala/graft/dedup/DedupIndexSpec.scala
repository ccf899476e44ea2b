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

  test("band compact folds duplicate representatives; query results identical") {
    val dir = tmp("graft-bandcompact")
    DedupIndex.buildBand(corpus, "doc_id", "text", dir)
    // day-1 doc 21 exactly duplicates indexed doc 1's text -> a second
    // representative with an identical gram set (documented-harmless,
    // but index rows then grow with the duplicate rate)
    val day1 = docs(
      21L -> "the quick brown fox jumps over the lazy dog near the river bank",
      22L -> "some fresh day one content matching nothing else in the corpus")
    assert(DedupIndex.appendBand(spark, dir, day1, "doc_id", "text", "day-1"))
    val batch =
      docs(31L -> "the quick brown fox jumps over the lazy dog near the river bank")
    val before = survivorsOf(
      DedupIndex.dedupBatch(spark, dir, batch, "doc_id", "text", 0.5))
    val rowsBefore = DedupIndex.loadBand(spark, dir)._1.count()
    val st = DedupIndex.compact(spark, dir)
    // corpus has 4 distinct texts (1≡3) + 2 appended = 6 reps, one of
    // which (21) duplicates rep 1's gram set
    assert(st.kind === "band" && st.repsBefore === 6L && st.repsAfter === 5L)
    val rowsAfter = DedupIndex.loadBand(spark, dir)._1.count()
    assert(rowsAfter < rowsBefore)
    assert(survivorsOf(
      DedupIndex.dedupBatch(spark, dir, batch, "doc_id", "text", 0.5))
      === before)
    assert(before === Set(31L -> 1L))
  }

  test("prefix compact: fresh-df re-rank cuts candidates, merges dup reps, pair set invariant") {
    val dir = tmp("graft-prefixcompact")
    val corpus0 = docs(
      1L -> "the quick brown fox jumps over the lazy dog near the river bank",
      2L -> "a completely different document about distributed query engines",
      4L -> "columnar storage formats amortize scan cost across wide tables")
    DedupIndex.buildPrefix(corpus0, "doc_id", "text", dir, 0.5)
    // day-1 drift: 30 docs sharing the gram "boiler plate prefix" — unseen
    // at build, so it ranks at df 0 ("rarest") in every appended prefix
    // and in every future batch's, even though appends made it boilerplate
    // — plus doc 131 exactly duplicating indexed doc 1 (a duplicate rep)
    val day1 = docs(((100L until 130L).map(i =>
        i -> s"boiler plate prefix zz$i yy$i") :+
      (131L -> "the quick brown fox jumps over the lazy dog near the river bank")): _*)
    assert(DedupIndex.appendPrefix(spark, dir, day1, "doc_id", "text", "day-1"))
    val batch = docs(
      900L -> "boiler plate prefix qq1 qq2",
      901L -> "the quick brown fox jumps over the lazy dog near the river bank")
    def candidates(): Long = {
      val ix = DedupIndex.loadPrefix(spark, dir)
      val (_, bprefix, _) =
        Dedup.ppjoinBatchSide(ix, batch, "doc_id", "text", 0.5)
      val (cross, internal) =
        Dedup.ppjoinCandidatePairs(ix.prefix, bprefix, 0.5)
      cross.count() + internal.count()
    }
    val pairsBefore =
      pairsOf(DedupIndex.ppjoinBatch(spark, dir, batch, "doc_id", "text"))
    val candBefore = candidates()
    // doc 900 shares the stale-"rare" boilerplate gram with all 30 drifted
    // prefixes — none of which verify
    assert(candBefore >= 30L)
    val st = DedupIndex.compact(spark, dir)
    assert(st.kind === "prefix" && st.repsBefore === 34L && st.repsAfter === 33L)
    val candAfter = candidates()
    assert(candAfter < candBefore,
      s"fresh-df re-rank must cut candidate fan-out ($candBefore -> $candAfter)")
    val pairsAfter =
      pairsOf(DedupIndex.ppjoinBatch(spark, dir, batch, "doc_id", "text"))
    assert(pairsAfter === pairsBefore, "the pair set is the exactness contract")
    // the merged 1/131 family still expands both members against doc 901
    assert(pairsAfter.map(p => (p._1, p._2)) === Set((1L, 901L), (131L, 901L)))
  }

  test("a crashed prefix compact leaves the index offline-loud and re-runnable") {
    val dir = tmp("graft-prefixcrash")
    DedupIndex.buildPrefix(corpus, "doc_id", "text", dir, 0.5)
    // simulate a compact that died right after fencing readers
    val metaF = new java.io.File(dir, "_meta.json")
    assert(metaF.renameTo(new java.io.File(dir, "_meta.json.compacting-x")))
    val e = intercept[IllegalArgumentException](
      DedupIndex.ppjoinBatch(spark, dir, batch, "doc_id", "text"))
    assert(e.getMessage.contains("no dedup index published"))
    // re-running compact adopts the retired meta and finishes the job
    val st = DedupIndex.compact(spark, dir)
    assert(st.kind === "prefix")
    assert(metaF.isFile)
    assert(!new java.io.File(dir, "_meta.json.compacting-x").exists())
    val viaIndex = DedupIndex.ppjoinBatch(spark, dir, batch, "doc_id", "text")
    assert(pairsOf(viaIndex).map(p => (p._1, p._2)) ===
      Set((1L, 11L), (3L, 11L), (2L, 12L), (13L, 14L)))
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
