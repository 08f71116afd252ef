package graft

import org.apache.spark.sql.SparkSession

/** Builder scratch (verdict-r7 "wrong #1"): chase the q_rollup bench
  * spread — min 1.0 s / max 21.6 s / sigma 8.2 in the driver's r7 run,
  * reproduced at 1.0→45.7 s on a QUIET box (12 repeats, one JVM, no
  * full GCs, max pause 189 ms — GC exonerated). Prints CHRONOLOGICAL
  * per-run times plus per-run executor-cpu/task counts so the growth
  * vs spike question is answerable, with a thread dump taken from a
  * watchdog when a run exceeds 5 s to catch the mechanism in the act.
  */
object RollupScratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 1) args(1).toInt else 12
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mainThread = Thread.currentThread()
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    (1 to repeats).foreach { i =>
      val t0 = System.nanoTime()
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      // 100 ms sampler of the MAIN thread: histogram the deepest frame
      // in org.apache.spark/*graft* so slow runs attribute themselves.
      val watchdog = new Thread(() => {
        while (!done.get()) {
          Thread.sleep(100)
          if (!done.get() && (System.nanoTime() - t0) / 1e9 > 3.0) {
            val st = mainThread.getStackTrace
            val key = "MAIN " + st.take(20).map(_.toString).mkString(" <- ")
            if (key.nonEmpty) hist.merge(key, 1, (a, b) => a + b)
            // what is everyone else doing while main waits?
            import scala.jdk.CollectionConverters._
            Thread.getAllStackTraces.asScala.foreach { case (t, s) =>
              if ((t ne mainThread) && t.getState == Thread.State.RUNNABLE &&
                  s.nonEmpty && !s.head.toString.contains("epollWait") &&
                  !s.head.toString.contains("Native Method")) {
                hist.merge("OTHER " + s.take(4).map(_.toString).mkString(" <- "),
                  1, (a, b) => a + b)
              }
            }
          }
        }
      })
      watchdog.setDaemon(true); watchdog.start()
      CacheScope.fullEval(SparkEntry.queries("q_rollup")(spark, dir))
      done.set(true)
      spark.catalog.clearCache()
      println(f"run $i%2d  ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    import scala.jdk.CollectionConverters._
    println("=== main-thread sample histogram (slow intervals only) ===")
    hist.asScala.toSeq.sortBy(-_._2).take(15).foreach { case (k, n) =>
      println(f"$n%6d  $k")
    }
    spark.stop()
  }
}
