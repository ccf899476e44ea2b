package graft.plans

import org.apache.spark.sql.SparkSession

/** Per-round progress lines for the iterative operators (PageRank,
  * connected components, k-core, BFS). Off by default; enabled with
  * `spark.graft.round.log=true` (or env `SPARK_GRAFT_ROUND_LOG=1`). Two
  * uses: the repo's scale probes record empirical round counts and
  * per-round times at 10×/100× (SCALE_PROBE.md), and a cluster operator
  * watching a 100 TB run gets the same visibility — with log-bounded
  * round counts, "which round are we in and is per-round time flat" is
  * the entire health question for this operator family.
  */
object RoundLog {

  val Key = "spark.graft.round.log"

  def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption(Key)
      .orElse(sys.env.get("SPARK_GRAFT_ROUND_LOG"))
      .exists(v => v == "true" || v == "1")

  /** Start a timer for one operator run; returns a closure to call once
    * per round with (round index, short info). No-ops when disabled.
    */
  def timer(spark: SparkSession, op: String): (Int, String) => Unit = {
    if (!enabled(spark)) (_, _) => ()
    else {
      var last = System.nanoTime()
      (round: Int, info: String) => {
        val now = System.nanoTime()
        println(f"[round] op=$op round=$round round_sec=${(now - last) / 1e9}%.2f $info")
        last = now
      }
    }
  }
}
