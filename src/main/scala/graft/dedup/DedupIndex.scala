package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.VersionedTable

/** Persisted near-dup indexes — the [[graft.sim.AnnIndex]] treatment for the
  * two text-dedup index families, closing the last dedup path that re-derived
  * its corpus index per batch:
  *
  *  - MinHash BAND index ([[Dedup.bandIndex]] rows): one row per
  *    (exact-dup representative, band) — what [[Dedup.dedupAgainstIndex]]
  *    equi-joins a daily batch against.
  *  - PPJoin PREFIX index ([[Dedup.PrefixIndex]]: gram document frequencies,
  *    per-doc prefix rows, gram sets) — what [[Dedup.ppjoinAgainst]] joins
  *    against for EXACT (zero-false-negative) incremental dedup.
  *
  * Both are [[VersionedTable]]-backed: the build is an atomic `create` (a
  * crashed build is invisible — no manifest, no table), appends are
  * exactly-once under an idempotence tag ([[VersionedTable.appendBatch]]
  * refuses a replayed tag atomically under the manifest CAS), and readers
  * always see a complete committed snapshot of EACH table even while an
  * append publishes (the manifest pins the file list — the reader/appender
  * overlap AnnIndex's directory appends explicitly exclude). Atomicity is
  * per table, not across the prefix index's three tables — cross-table
  * consistency for concurrent readers comes from [[appendPrefix]]'s
  * support-first commit order instead (see its scaladoc).
  *
  * Why this matters at 100 TB: the reference's whole operating mode is
  * incremental daily import (`/root/reference/code/manager.py:363-407` keeps
  * re-importing deltas into the live table); re-shingling + re-signing an
  * unchanged 100 TB corpus per daily batch is impossible. With the index
  * persisted, per-batch cost is (batch-sized shingle/signature build) +
  * equi-joins against the index — independent of corpus size except through
  * the join's pruned index-side scan.
  *
  * Append semantics:
  *  - Band: appended docs are collapsed/banded WITHIN the batch only. A new
  *    doc exactly duplicating an existing corpus doc yields a second
  *    representative with identical grams — harmless: both match the same
  *    future batches and `min(old_id)` elects the same survivor as a global
  *    rebuild (spec-asserted append ≡ rebuild).
  *  - Prefix: appended docs rank their grams by the ORIGINAL index's
  *    (df, gram) order with unseen grams at df 0 ([[Dedup.ppjoinBatchSide]])
  *    — the frequency table is never updated, so every doc ever indexed
  *    shares one global total order and the prefix/positional-filter
  *    exactness lemmas keep holding as the index grows (the
  *    [[graft.streaming.StreamingPpjoin]] argument, now applied to the base
  *    index itself). Pair sets are identical to a full rebuild — both are
  *    exact algorithms — though the candidate sets differ (rebuild re-ranks
  *    by updated df).
  *
  * Geometry is part of the artifact: `_meta.json` (AnnIndex pattern) pins
  * (bands, rowsPerBand) / threshold at build time and query/append paths
  * read it back — a geometry mismatch between builder and consumer is
  * impossible by construction.
  */
object DedupIndex {

  private def bandRoot(dir: String) = s"$dir/bands"
  private def freqRoot(dir: String) = s"$dir/freq"
  private def prefixRoot(dir: String) = s"$dir/prefix"
  private def gramsRoot(dir: String) = s"$dir/grams"
  private def membersRoot(dir: String) = s"$dir/members"
  private def metaFile(dir: String) = new java.io.File(dir, "_meta.json")

  private def writeMeta(dir: String, json: String): Unit = {
    val f = metaFile(dir)
    f.getParentFile.mkdirs()
    java.nio.file.Files.writeString(f.toPath, json)
    ()
  }

  private def readMeta(dir: String, kind: String): String = {
    val f = metaFile(dir)
    require(f.isFile, s"no dedup index published at $dir")
    val txt = java.nio.file.Files.readString(f.toPath)
    require(txt.contains(s""""kind":"$kind""""),
      s"index at $dir is not a $kind index: $txt")
    txt
  }

  private def intField(txt: String, k: String): Int =
    s""""$k":(\\d+)""".r.findFirstMatchIn(txt)
      .getOrElse(sys.error(s"missing $k in index meta: $txt")).group(1).toInt

  /** Like [[intField]] but absent-tolerant — v1 artifacts predate the "v"
    * meta field entirely, so version parsing must default (to 1) rather
    * than throw, or the curated "rebuild it" migration error below could
    * never fire for exactly the artifacts it was written for.
    */
  private def intFieldOr(txt: String, k: String, default: Int): Int =
    s""""$k":(\\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toInt).getOrElse(default)

  private def doubleField(txt: String, k: String): Double =
    s""""$k":([0-9.]+)""".r.findFirstMatchIn(txt)
      .getOrElse(sys.error(s"missing $k in index meta: $txt")).group(1).toDouble

  // ---------------------------------------------------------------- band

  /** Build and publish the MinHash band index over `corpus`. The table
    * commit is the publish point; `_meta.json` lands first so a table
    * without meta is impossible (meta without table reads as "no index" —
    * [[loadBand]] requires both).
    */
  def buildBand(corpus: DataFrame, idCol: String, textCol: String,
      dir: String, bands: Int = 6, rowsPerBand: Int = 2): Unit = {
    writeMeta(dir,
      s"""{"kind":"band","bands":$bands,"rowsPerBand":$rowsPerBand}""")
    VersionedTable.create(corpus.sparkSession, bandRoot(dir),
      Dedup.bandIndex(corpus, idCol, textCol, bands, rowsPerBand))
    ()
  }

  /** Exactly-once append of `newDocs`' band rows under `tag` — the daily
    * post-dedup step that folds the day's docs into tomorrow's index.
    * Returns false when `tag` was already applied (a replayed drop is a
    * no-op).
    */
  def appendBand(spark: SparkSession, dir: String, newDocs: DataFrame,
      idCol: String, textCol: String, tag: String): Boolean = {
    val meta = readMeta(dir, "band")
    VersionedTable.appendBatch(spark, bandRoot(dir),
      Dedup.bandIndex(newDocs, idCol, textCol,
        intField(meta, "bands"), intField(meta, "rowsPerBand")), tag)
  }

  /** The persisted band rows plus their build geometry. */
  def loadBand(spark: SparkSession, dir: String): (DataFrame, Int, Int) = {
    val meta = readMeta(dir, "band")
    (VersionedTable.read(spark, bandRoot(dir)),
      intField(meta, "bands"), intField(meta, "rowsPerBand"))
  }

  /** Incremental LSH dedup of `batch` against the persisted index — the
    * production daily-import query: batch-sized signature build + band
    * equi-join; the corpus is touched only through the index scan.
    */
  def dedupBatch(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, textCol: String, threshold: Double): DataFrame = {
    val (index, bands, rowsPerBand) = loadBand(spark, dir)
    Dedup.dedupAgainstIndex(index, batch, idCol, textCol, threshold,
      bands, rowsPerBand)
  }

  // -------------------------------------------------------------- prefix

  /** Build and publish the PPJoin prefix index over `corpus` at `threshold`
    * (the build threshold is the index's contract — queries must use the
    * same τ, which [[ppjoinBatch]] reads back from the meta).
    */
  def buildPrefix(corpus: DataFrame, idCol: String, textCol: String,
      dir: String, threshold: Double): Unit = {
    val spark = corpus.sparkSession
    val ix = Dedup.prefixIndex(corpus, idCol, textCol, threshold)
    // "v":2 — the collapsed format: prefix/gram rows per exact-dup FAMILY
    // representative plus the member map (loadPrefix refuses v1 artifacts,
    // which stored per-doc rows and no members table)
    writeMeta(dir, s"""{"kind":"prefix","v":2,"threshold":$threshold}""")
    // support-first order (freq, members, grams before prefix) — same
    // rationale as [[appendPrefix]]: a reader that can see a prefix row
    // must be able to see everything that row's candidates need
    VersionedTable.create(spark, freqRoot(dir), ix.freq)
    VersionedTable.create(spark, membersRoot(dir), ix.members)
    VersionedTable.create(spark, gramsRoot(dir), ix.grams)
    VersionedTable.create(spark, prefixRoot(dir), ix.prefix)
    ()
  }

  /** Exactly-once append of `newDocs`' family rows under `tag` — the batch
    * is collapsed to exact-dup representatives whose prefixes rank by the
    * ORIGINAL frequency table (never updated — the shared total order the
    * exactness proof needs), plus its member rows. Three tables commit
    * under the same tag, SUPPORT FIRST: `members`, then `grams`, then
    * `prefix` LAST. Candidates originate exclusively from prefix rows
    * ([[Dedup.ppjoinAgainst]]'s cross join), so a concurrent
    * [[ppjoinBatch]] reader — the daily-ingest pattern this index exists
    * for — either cannot see the batch's families at all (prefix not yet
    * committed: the append is invisible, as if it ran later) or sees
    * prefix rows whose gram sets and member rows are already committed
    * (every candidate it generates is fully supported through verify and
    * expansion). The reverse order would let a reader generate candidates
    * whose verify support is missing — the inner joins in `ppjoinAgainst`
    * would silently DROP them: false negatives in an operator whose
    * contract is zero false negatives (mid-append reader spec-asserted in
    * DedupIndexSpec). A crash between commits is safe for the same
    * reason plus determinism: the recomputation is deterministic (frozen
    * freq, same batch), each table's replay is refused independently, and
    * the replay completes the partially-committed batch.
    * A batch doc exactly duplicating an already-indexed text yields a
    * second representative with an identical gram set — harmless, as in
    * [[appendBand]]: both families match the same future batches and
    * expansion unions their (disjoint) member lists.
    */
  def appendPrefix(spark: SparkSession, dir: String, newDocs: DataFrame,
      idCol: String, textCol: String, tag: String): Boolean = {
    val meta = readMeta(dir, "prefix")
    val ix = loadPrefix(spark, dir)
    val (bg, bprefix, bmembers) = Dedup.ppjoinBatchSide(ix, newDocs, idCol,
      textCol, doubleField(meta, "threshold"))
    val a = VersionedTable.appendBatch(spark, membersRoot(dir), bmembers, tag)
    val b = VersionedTable.appendBatch(spark, gramsRoot(dir), bg, tag)
    val c = VersionedTable.appendBatch(spark, prefixRoot(dir), bprefix, tag)
    a || b || c
  }

  def loadPrefix(spark: SparkSession, dir: String): Dedup.PrefixIndex = {
    val meta = readMeta(dir, "prefix")
    require(intFieldOr(meta, "v", 1) == 2,
      s"prefix index at $dir predates the collapsed v2 format — rebuild it")
    Dedup.PrefixIndex(
      VersionedTable.read(spark, freqRoot(dir)),
      VersionedTable.read(spark, prefixRoot(dir)),
      VersionedTable.read(spark, gramsRoot(dir)),
      VersionedTable.read(spark, membersRoot(dir)))
  }

  /** The persisted index's build threshold. */
  def prefixThreshold(dir: String): Double =
    doubleField(readMeta(dir, "prefix"), "threshold")

  /** EXACT incremental dedup of `batch` against the persisted prefix index
    * at the index's build threshold — batch×corpus and batch×batch pairs,
    * zero false negatives, corpus never self-paired.
    */
  def ppjoinBatch(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, textCol: String): DataFrame =
    Dedup.ppjoinAgainst(loadPrefix(spark, dir), batch, idCol, textCol,
      prefixThreshold(dir))
}
