package graft

import org.apache.spark.sql.functions._

/** The persist-ownership contract: operator-internal caches are
  * query-scoped — automatically released once the consuming query
  * finishes — so a library user in a long-lived session never
  * accumulates orphaned storage blocks. Release rides the (async)
  * listener bus, hence the bounded polling.
  */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  /** Materialized cache blocks register their RDD in the context;
    * release must empty it again (nothing else in this suite caches).
    */
  private def awaitNoCachedRdds(timeoutMs: Long = 20000): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (spark.sparkContext.getPersistentRDDs.nonEmpty
        && System.currentTimeMillis() < deadline) Thread.sleep(50)
    spark.sparkContext.getPersistentRDDs.isEmpty
  }

  test("autoRelease drops the cache after the consuming action") {
    spark.catalog.clearCache()
    val base = CacheScope.autoRelease(
      Seq(1, 2, 3).toDF("x").select(col("x"), (col("x") * 2).as("y")))
    // two branches of one query share the materialized cache ...
    val n = base.filter(col("y") > 2).union(base.filter(col("x") === 1)).count()
    assert(n == 3)
    // ... and nothing survives the action
    assert(awaitNoCachedRdds(), "cache block outlived its query")
  }

  test("an unconsumed autoRelease frame never materializes storage") {
    spark.catalog.clearCache()
    CacheScope.autoRelease(Seq(1).toDF("x"))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("fullEval (toRdd path) releases the scoped cache too") {
    // a bare queryExecution.toRdd.count() has no SQL execution id, so
    // the release listener never hears about it; fullEval runs the same
    // action under a named execution id and must release like any
    // Dataset action — no surviving cached RDD, no clearCache help
    spark.catalog.clearCache()
    val base = CacheScope.autoRelease(
      Seq(1, 2, 3, 4).toDF("x").select(col("x"), (col("x") * 3).as("y")))
    val consumer = base.filter(col("y") > 3).union(base.filter(col("x") === 1))
    assert(CacheScope.fullEval(consumer) == 4L)
    assert(awaitNoCachedRdds(), "cache block outlived a toRdd-only query")
  }

  test("CF and dedup pipelines leave no cache behind without clearCache") {
    spark.catalog.clearCache()
    // the two heaviest internal-persist users, run as a user would —
    // plain Dataset actions, NO harness clearCache between them
    assert(SparkEntry.queries("q_cf_recommend")(spark, sf0).collect().nonEmpty)
    assert(SparkEntry.queries("q_ngram_jaccard")(spark, sf0).collect().nonEmpty)
    assert(awaitNoCachedRdds(), "operator persist leaked past its query")
  }
}
