package graft

import org.apache.spark.sql.SparkSession

/** Test-scope helper: print `explain("formatted")` for named gated
  * queries (plan audits for PLANS.md). Usage:
  * `sbt "Test/runMain graft.ExplainTool q_foo q_bar [sfDir]"`.
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val (names, dirs) = args.partition(_.startsWith("q_"))
    val dir = dirs.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
