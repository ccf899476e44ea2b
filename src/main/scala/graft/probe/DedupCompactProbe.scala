package graft.probe

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, DedupIndex}

/** 100×-scale certificate for `dedup-index-compact` (SCALE_PROBE cadence,
  * round 14): the pair set is the exactness contract, so compaction is
  * verified by EQUALITY — build a prefix index over the probe corpus,
  * append a day's drift, run the batch query, compact, run it again:
  * the two pair sets must be bit-identical (checked with two anti-joins,
  * never a hash shortcut), while duplicate representatives fold and the
  * candidate fan-out drops under the fresh-df re-rank.
  *
  * Usage: runMain graft.probe.DedupCompactProbe <probeSfDir> [tau=0.8]
  */
object DedupCompactProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tau = args.lift(1).map(_.toDouble).getOrElse(0.8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-compact-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val off = docs.agg(max("doc_id")).head().getLong(0) + 1
    // day-1 drift: exact duplicates of every 10th doc (duplicate reps in
    // the index) — the shape daily ingest actually produces
    val day1 = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + off).as("doc_id"), col("text"))
    // the probe query batch: tail-perturbed near-dups of every ...5 doc
    // (ids disjoint from everything indexed)
    val batch = docs.filter(col("doc_id") % 10 === 5)
      .select((col("doc_id") + 2 * off).as("doc_id"),
        concat(col("text"), lit(" compaction probe tail")).as("text"))

    val dir = java.nio.file.Files
      .createTempDirectory("graft-compactprobe").toString + "/ix"
    val (_, buildS) = t(DedupIndex.buildPrefix(docs, "doc_id", "text", dir, tau))
    val (_, appendS) =
      t(DedupIndex.appendPrefix(spark, dir, day1, "doc_id", "text", "day-1"))

    def candidates(): Long = {
      val ix = DedupIndex.loadPrefix(spark, dir)
      val (_, bprefix, _) =
        Dedup.ppjoinBatchSide(ix, batch, "doc_id", "text", tau)
      val (cross, internal) = Dedup.ppjoinCandidatePairs(ix.prefix, bprefix, tau)
      cross.count() + internal.count()
    }
    def pairs() = DedupIndex
      .ppjoinBatch(spark, dir, batch, "doc_id", "text")
      .select("doc_a", "doc_b", "jaccard")

    val (before, beforeS) = t(graft.plans.Lineage.cut(pairs()))
    val nBefore = before.count()
    val candBefore = candidates()
    val (st, compactS) = t(DedupIndex.compact(spark, dir))
    val (after, afterS) = t(graft.plans.Lineage.cut(pairs()))
    val nAfter = after.count()
    val candAfter = candidates()
    // exact set equality, both directions — the certificate
    val missing = before.exceptAll(after).count()
    val extra = after.exceptAll(before).count()

    println(
      s"""{"corpus": ${docs.count()}, "appended": ${day1.count()}, """ +
      s""""batch": ${batch.count()}, "tau": $tau, """ +
      s""""reps_before": ${st.repsBefore}, "reps_after": ${st.repsAfter}, """ +
      s""""pairs_before": $nBefore, "pairs_after": $nAfter, """ +
      s""""pairs_missing_after_compact": $missing, "pairs_extra": $extra, """ +
      s""""cand_before": $candBefore, "cand_after": $candAfter, """ +
      s""""build_s": ${f"$buildS%.1f"}, "append_s": ${f"$appendS%.1f"}, """ +
      s""""query_before_s": ${f"$beforeS%.1f"}, "compact_s": ${f"$compactS%.1f"}, """ +
      s""""query_after_s": ${f"$afterS%.1f"}}""")
    spark.stop()
  }
}
