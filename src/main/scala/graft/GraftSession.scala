package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession configuration for the graft library — the
  * settings every graft entry point (Verify, Bench, user applications)
  * should share, sized so one config block serves local smoke runs and
  * scales to a real cluster by overriding only `master` and the
  * parallelism pair.
  *
  *  - AQE on (default in Spark 4) carries the runtime re-planning this
  *    library leans on: runtime broadcast of small join sides, skew-join
  *    splitting, partition coalescing.
  *  - `spark.sql.shuffle.partitions` should track total cores at small
  *    scale (NOT the 200 default — 6× task overhead for nothing on a
  *    32-core box) and ~2-3× total cores on a cluster.
  *  - `maxPartitionBytes` 128m default: lower it if single-file inputs
  *    under-split (see [[PlanUtils.spread]] for the compute-side fix).
  *  - nanos-as-long: the testdata's TIMESTAMP(NANOS) parquet columns
  *    predate Spark's nanos support; [[Tables.events]] re-derives a
  *    typed timestamp.
  */
object GraftSession {
  def build(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft"): SparkSession =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
}
