package graft.plans

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (PageRank, connected
  * components, Lloyd, BPE rounds, semantic dedup): each round's plan must
  * be cut or the logical plan grows linearly in rounds and the optimizer
  * re-walks the whole history every iteration. Two modes:
  *
  *  - default — `localCheckpoint`: blocks live in executor storage. Fast
  *    (no FS round-trip), correct on `local[*]`, but the blocks die with
  *    their executor: on a 1000-executor cluster, one lost executor
  *    mid-iteration kills the whole job.
  *  - `spark.graft.checkpoint.reliable=true` — reliable `checkpoint()` to
  *    the fault-tolerant filesystem. The checkpoint dir comes from the
  *    SparkContext if already set, else from `spark.graft.checkpoint.dir`.
  *    This is the setting for long multi-round jobs at cluster scale:
  *    executor loss costs a task retry, not the job.
  *
  * Both modes are eager (the cut materializes now), so callers can
  * `unpersist` the superseded round immediately after cutting the next.
  */
object Lineage {

  val ReliableKey = "spark.graft.checkpoint.reliable"
  val DirKey = "spark.graft.checkpoint.dir"

  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.get(ReliableKey, "false").toBoolean) {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty) {
        val dir = spark.conf.getOption(DirKey).getOrElse(sys.error(
          s"$ReliableKey=true needs a checkpoint dir: set $DirKey " +
            "or SparkContext.setCheckpointDir"))
        sc.setCheckpointDir(dir)
      }
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)
  }
}
