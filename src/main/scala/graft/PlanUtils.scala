package graft

import org.apache.spark.sql.DataFrame

/** Plan-shaping helpers shared across operators. */
object PlanUtils {

  /** Ensure CPU-heavy per-row work downstream runs with at least the
    * session's default parallelism. A plain `repartition` is NOT
    * enough: Catalyst pushes deterministic projects/filters (and the
    * partial side of aggregations) below the exchange, so the work
    * lands back in the scan stage — which on a single-row-group
    * parquet file is ONE task (measured: whole pipelines serialized on
    * one core). The DataFrame→RDD→DataFrame round-trip is an optimizer
    * barrier that pins the exchange below the compute. No-op (no
    * shuffle at all) when the scan already has enough splits — i.e. on
    * any real multi-file lake; only the local single-file case pays
    * the (tiny, pre-pruned) shuffle.
    */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else spark.createDataFrame(df.repartition(target).rdd, df.schema)
  }
}
