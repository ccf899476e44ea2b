package graft.streaming

/** Memoized staging directories for the file-stream gates.
  *
  * A streaming gate drives a REAL Structured Streaming query over a parquet
  * file stream; the staged directory SIMULATES data arrival — it is the
  * fixture a production stream is fed by its upstream (the reference's
  * continuously-arriving imports, `/root/reference/code/manager.py:363-407`),
  * not work the engine performs. Building it once per dataset CONTENT per
  * JVM (the `DedupSurface.docBand` memo pattern) lets the gates time what
  * the engine actually does per arrival: stream admission, per-trigger
  * aggregation, one tagged commit per trigger, and the fold — the steady
  * production cost, exactly like the `*_indexed` dedup gates time load +
  * query against a persisted artifact rather than rebuilding it per rep.
  *
  * Content-stamped, not path-keyed: the scale-probe harness regenerates
  * datasets in place, and a stale staged copy would silently diverge from
  * the SQL oracles recomputing over the live parquet.
  */
object StagedSources {

  private val dirs =
    scala.collection.concurrent.TrieMap.empty[(String, String, Long), String]

  private def contentStamp(d: String, table: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty)
          .sortBy(_.getName)
          .foldLeft(f.getName.hashCode.toLong)((a, c) => a * 1000003L ^ walk(c))
      else f.getName.hashCode.toLong * 31 + f.length() * 1000003L + f.lastModified()
    val f = new java.io.File(d, s"$table.parquet")
    if (f.exists()) walk(f) else 0L
  }

  /** The staged directory for (`key`, dataset): built by `build` on first
    * use for this dataset content, reused afterwards.
    */
  def dir(key: String, sfDir: String, table: String)
      (build: String => Unit): String =
    dirs.getOrElseUpdate((key, sfDir, contentStamp(sfDir, table)), {
      val p = java.nio.file.Files
        .createTempDirectory(s"graft-staged-$key").toString
      build(p)
      p
    })

  /** Gate admission: files per trigger. 12 staged files at 4 per trigger =
    * 3 real triggers with production-like batch admission (several arrived
    * files amortize one commit cycle — the r14 sweep in BENCH_COMPARE.md
    * measures the curve). Overridable for sweep runs.
    */
  val StagedFiles = 12
  def filesPerTrigger: String =
    sys.env.getOrElse("SPARK_GRAFT_STREAM_MFPT", "4")
}
