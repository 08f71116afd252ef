package graft

import graft.operators.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (test-scope, not shipped): decompose the near-dup pipeline's
  * cost drivers at a scale factor — candidate volume vs verify volume
  * vs clustering — to attribute decade-over-decade growth.
  *
  * Usage: DedupScaleScratch <sfDir>
  */
object DedupScaleScratch {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // shingle stats: saturation of the 3-gram space
    val sh = DedupOps.hashedShingled(docs, 3)
    val nShingles = timed("distinct shingles")(
      sh.select(explode(col("hs")).as("h")).distinct().count())

    // band configs: (r rows/band, b bands) with r·b = sigLen 128;
    // t ≈ (1/b)^(1/r) is each config's S-curve threshold
    val configs = args.drop(1).map { s =>
      val Array(r, b) = s.split("x"); (r.toInt, b.toInt)
    } match { case a if a.nonEmpty => a.toSeq; case _ => Seq((4, 32)) }

    val sigs = DedupOps.minhashSignatures(
      DedupOps.hashedShingled(docs, 3).withColumnRenamed("hs", "hs_sig")
        .select(col("doc_id"), col("hs_sig")), 128, "hs_sig").persist()
    sigs.count()
    val stats = configs.map { case (r, b) =>
      val cand = timed(s"lsh candidates (r=$r,b=$b)")(
        DedupOps.lshCandidates(sigs, r, b).count())
      val pairs = timed(s"verified pairs (r=$r,b=$b,minJac 0.8)")(
        DedupOps.verifiedNearDups(docs, r = r, bands = b).count())
      (r, b, cand, pairs)
    }
    sigs.unpersist()

    val (cr, cb) = configs.head
    val clusters = timed(s"nearDupClusters (r=$cr,b=$cb)")(
      DedupOps.nearDupClusters(
        DedupOps.verifiedNearDups(docs, r = cr, bands = cb)).count())

    println(s"[scratch] dir=$dir docs=$nDocs shingles=$nShingles " +
      stats.map { case (r, b, c, p) => s"cfg${r}x$b: cand=$c pairs=$p" }
        .mkString(" ") + s" clusteredNodes=$clusters")
    spark.stop()
  }
}
