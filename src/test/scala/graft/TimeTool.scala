package graft

import org.apache.spark.sql.SparkSession

/** Test-scope helper: time named gated queries in isolation (median of
  * N full evaluations, same fullEval contract as Bench). Usage:
  * `sbt "Test/runMain graft.TimeTool q_foo [q_bar ...] [sfDir] [repeats]"`.
  */
object TimeTool {
  def main(args: Array[String]): Unit = {
    val names = args.filter(_.startsWith("q_")).toSeq
    val dir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.1")
    val repeats = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val ts = (1 to repeats + 1).map { _ =>
        val t0 = System.nanoTime()
        CacheScope.fullEval(SparkEntry.queries(n)(spark, dir))
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted // drop warm-up
      println(f"$n%-28s median=${ts(ts.size / 2)}%.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
