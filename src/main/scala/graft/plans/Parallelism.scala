package graft.plans

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism widening (optimization guide §2: make
  * partitioning scale-adaptive, never a constant tuned for one shape).
  *
  * A CPU-dense narrow stage inherits the parallelism of its SOURCE — and a
  * small parquet table arrives as a handful of scan splits, serializing
  * per-row kernels (md5 melts, shingle UDFs, merge-apply chains) on a few
  * cores even on a 32-core session. [[widen]] repartitions UP to the
  * session default parallelism only when the plan is under-partitioned;
  * an already-parallel 100 TB scan is left untouched (repartitioning it
  * would be a full shuffle of the payload).
  *
  * Input contract: BATCH, scan-rooted frames (every call site passes a
  * parquet scan or a checkpointed leaf). Guards for everything else:
  *  - streaming frames pass through untouched (`.rdd` would throw);
  *  - plans already containing an Exchange pass through untouched — their
  *    downstream parallelism is the session shuffle width already, and
  *    probing them via `.rdd` would FINALIZE the adaptive plan and execute
  *    its shuffle stages just to read a partition count. For an
  *    exchange-free plan `.rdd` only builds the scan RDD driver-side (no
  *    job), so the probe is a planning-time cost, not an execution.
  */
object Parallelism {

  def widen(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    // the guard reads the RENDERED initial plan, not sparkPlan: under AQE
    // exchanges are inserted by the preparation rules (EnsureRequirements
    // runs inside AdaptiveSparkPlanExec), so sparkPlan never shows them —
    // while explainString renders the prepared initial plan WITHOUT
    // finalizing or executing anything. Matching the substring also
    // catches BroadcastExchange: any joined/aggregated input is beyond
    // widen's scan-rooted contract and passes through conservatively.
    val shape = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    if (shape.contains("Exchange")) return df
    val dp = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < dp) df.repartition(dp) else df
  }
}
