package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming sink patterns beyond the memory sink: foreachBatch (the
  * "do arbitrary batch work per micro-batch" workhorse — here an
  * idempotent parquet write keyed by batch id) and the RocksDB state
  * store provider (the bounded-heap state backend any 100 TB streaming
  * aggregation runs on).
  */
class StreamingSinksSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch writes each micro-batch to parquet; union equals the input") {
    val dir = java.nio.file.Files.createTempDirectory("graft_febatch").toString
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Double)]
    val q = source.toDS().toDF("k", "v")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // idempotent: one directory per batch id, overwritten on retry
        batch.write.mode("overwrite").parquet(s"$dir/batch=$batchId")
        ()
      }
      .start()
    source.addData(1L -> 1.0, 2L -> 2.0)
    q.processAllAvailable()
    source.addData(3L -> 3.0)
    q.processAllAvailable()
    q.stop()
    val back = spark.read.parquet(s"$dir/batch=*")
    assert(back.count() == 3)
    assert(back.agg(sum("v")).head().getDouble(0) == 6.0)
  }

  test("welfordByKey runs on the RocksDB state store with identical results") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val source = MemoryStream[(String, Double)]
      val q = StreamingOps.welfordByKey(source.toDS())
        .writeStream.format("memory").queryName("welford_rocksdb_test")
        .outputMode("update").start()
      source.addData("a" -> 1.0, "a" -> 3.0)
      q.processAllAvailable()
      source.addData("a" -> 5.0)
      q.processAllAvailable()
      val latest = spark.table("welford_rocksdb_test")
        .orderBy($"n".desc).limit(1)
        .as[StreamingOps.WelfordRow].head()
      q.stop()
      assert(latest.n == 3L)
      assert(math.abs(latest.mean - 3.0) < 1e-12)
      // population std of {1,3,5} = sqrt(8/3)
      assert(math.abs(latest.std - math.sqrt(8.0 / 3.0)) < 1e-12)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("file sink + checkpoint: restart is exactly-once — no reprocessing, only new files") {
    val base = s"/tmp/graft_sink_restart_${System.nanoTime()}"
    val (src, out, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")
    val docs = Tables.documents(spark, sf0).select($"doc_id", $"lang")
    docs.filter($"doc_id" < 200).write.parquet(src)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(src)
      val q = stream.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 200)
    // restart against the same checkpoint with no new data: the source
    // log remembers every processed file — nothing is reprocessed
    runOnce()
    assert(spark.read.parquet(out).count() == 200)
    // land a new batch of files; ONLY those rows are appended
    docs.filter($"doc_id" >= 200 && $"doc_id" < 300)
      .write.mode("append").parquet(src)
    runOnce()
    val got = spark.read.parquet(out)
    assert(got.count() == 300)
    assert(got.select("doc_id").distinct().count() == 300) // exactly-once: no dups
  }
}
