package graft.probe

import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of named gates into files — the
  * before/after evidence for optimization rounds (plans/rNN/<gate>_*.txt).
  *
  *   sbt "runMain graft.probe.PlanOne <sfDir> <outDir> <suffix> <g1,g2,...>"
  *
  * Runs each gate to completion through the noop sink first so AQE settles
  * on the final plan (same rationale as PlanDump), then writes
  * `<outDir>/<gate>_<suffix>.txt`.
  */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r17")
    val suffix = args.lift(2).getOrElse("before")
    val gates = args.lift(3).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(sys.error("pass a comma-list of gate names"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // optional 5th arg "rounds": also dump every per-round (pre-cut) plan
    // of iterative operators via the Lineage dump hook — the final plan of
    // a checkpointing loop shows only the last Scan ExistingRDD
    val rounds = args.lift(4).contains("rounds")
    gates.foreach { gate =>
      val fn = graft.SparkEntry.queries.getOrElse(gate,
        sys.error(s"unknown gate $gate"))
      if (rounds) spark.conf.set(graft.plans.Lineage.DumpDirKey,
        s"$outDir/${gate}_${suffix}_rounds")
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      if (rounds) spark.conf.unset(graft.plans.Lineage.DumpDirKey)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${gate}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $outDir/${gate}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
