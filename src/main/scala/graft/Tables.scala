package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the driver-generated testdata tables (TESTDATA.md).
  *
  * Every loader takes the scale-factor directory explicitly so the same
  * operator code runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1
  * (bench) — and, by extension, at any path on a real cluster. Parquet
  * scans are columnar + vectorized; operators should `select` only the
  * columns they need so Catalyst prunes the scan (`ReadSchema`).
  */
object Tables {
  def region(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(s"$dir/region.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(s"$dir/nation.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame      = spark.read.parquet(s"$dir/part.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(s"$dir/orders.parquet")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(s"$dir/lineitem.parquet")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by all graft
    * session builders) it surfaces as epoch-nanos LONG. Re-derive a
    * microsecond timestamp so downstream time logic is type-correct.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // `div`, not `/`: Spark's `/` is DOUBLE division, and at epoch-nano
    // magnitude (~1.7e18) the rounded quotient can land one micro HIGH
    // before the cast truncates — integer division matches the parquet
    // reader's (and DuckDB's) exact truncation.
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")
}
