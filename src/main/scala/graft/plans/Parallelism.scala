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
  */
object Parallelism {

  def widen(df: DataFrame): DataFrame = {
    val dp = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < dp) df.repartition(dp) else df
  }
}
