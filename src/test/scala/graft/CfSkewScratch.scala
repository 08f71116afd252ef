package graft

import org.apache.spark.sql.SparkSession

/** Measurement harness behind SCALE.md's salted-CF skew table (builder
  * tooling, test scope). The window-vs-salted trade depends on
  * rows-per-task: at local[32]'s 32 shuffle partitions a 6M-row corpus
  * gives ~190k rows/task and even a Zipf head item (~340k rows at
  * zipf_sf1) is only ~2 tasks' worth — the window form wins. A
  * 1000-executor cluster runs thousands of partitions, where the head
  * key is 30×+ rows-per-task and the window form's hot task IS the
  * stage. This main replays both gated CF forms at an arbitrary
  * shuffle-partition count so that regime is measured, not argued.
  *
  * Usage: CfSkewScratch <sfDir> <shufflePartitions> [repeats]
  */
object CfSkewScratch {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val parts = args(1).toInt
    val repeats = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("q_cf_sims", "q_cf_sims_salted").foreach { n =>
      val ts = (1 to repeats + 1).map { _ =>
        val t0 = System.nanoTime()
        CacheScope.fullEval(SparkEntry.queries(n)(spark, dir))
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      println(f"$n%-22s parts=$parts%-5d median=${ts(ts.size / 2)}%.3f  " +
        f"runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    // Isolated stage: the end-to-end numbers share the scan + orders
    // join + dedup aggregate (most of the wall), which masks the one
    // stage the hatch actually changes. Pin the deduped ratings, then
    // time ONLY supportFiltered→meanCentered in both forms.
    // Optional `hot=<frac>` arg: remap that fraction of ratings onto
    // item 0 (deduped again) — the viral-key stress regime where the
    // window form's hot task holds frac·N rows. This is where the
    // crossover lives; the Zipf head alone (~6% at zipf_sf1) sorts in
    // one task in milliseconds and never dominates the stage.
    import org.apache.spark.sql.functions._
    import graft.operators.{CFOps, Ratings}
    val hotFrac = args.find(_.startsWith("hot="))
      .map(_.stripPrefix("hot=").toDouble).getOrElse(0.0)
    val base = Ratings.dedupedByItem(spark, dir)
    val remapped =
      if (hotFrac == 0.0) base
      else base
        .withColumn("item_id",
          when(pmod(col("user_id") * 31L + col("item_id"), lit(1000L))
            < lit((hotFrac * 1000).toLong), lit(0L)).otherwise(col("item_id")))
        .groupBy("user_id", "item_id").agg(max("rating").as("rating"))
        .repartition(col("item_id"))
    val ratings = remapped.persist()
    ratings.count()
    Seq("window" -> CFOps.Params(),
        "salted" -> CFOps.Params(saltedSupport = true)).foreach { case (nm, p) =>
      val ts = (1 to repeats + 1).map { _ =>
        val t0 = System.nanoTime()
        CacheScope.fullEval(CFOps.meanCentered(CFOps.supportFiltered(ratings, p), p))
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      println(f"stage:$nm%-16s parts=$parts%-5d median=${ts(ts.size / 2)}%.3f  " +
        f"runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    ratings.unpersist()
    spark.stop()
  }
}
