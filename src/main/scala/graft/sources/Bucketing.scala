package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout: the co-located-join storage path.
  *
  * At corpus scale the dominant cost of a fact-fact equi-join is
  * shuffling both sides on the key. Spark's table bucketing removes
  * that exchange entirely when BOTH sides were written bucketed on the
  * join key with the same bucket count: each side's scan reports
  * `HashPartitioning(key, n)` and the join planner sees its
  * distribution requirement already satisfied — the join runs
  * scan→sort→merge with ZERO Exchange nodes. That is the one layout
  * decision a 100 TB pipeline makes once at ingest and amortizes over
  * every downstream join; it cannot be expressed by any per-query
  * operator, only by the writer, which is why it lives here in
  * `sources` and is gated end to end (write → catalog read → join →
  * oracle compare) rather than asserted.
  *
  * The reference has no bucketed storage (its MR engine re-partitions
  * per job — MRSystemSimulator2020.py partitionFunction re-hashes every
  * map output); this is the Spark-native answer to that repeated
  * shuffle.
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed (and in-bucket sorted) on
    * `key` into `buckets` hash buckets, replacing any existing
    * registration of `table`, and return the catalog-backed read —
    * downstream plans see the bucket spec only through the catalog,
    * never through a plain path read.
    *
    * The frame is pre-repartitioned to `buckets` partitions on the key
    * with the SAME hash the bucket writer uses (Murmur3), so each write
    * task owns exactly one bucket and every bucket is ONE file —
    * the layout that keeps Spark's in-bucket `sortBy` metadata usable
    * (multi-file buckets force a defensive re-sort under the merge
    * join) and, at scale, the layout a compaction job maintains.
    */
  def writeBucketed(df: DataFrame, table: String, path: String, key: String,
      buckets: Int): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.functions.col
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
    spark.table(table)
  }
}
