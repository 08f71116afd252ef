package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BandingScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = spark.range(0, 4000).select(col("id").as("doc_id"))
      .as[Long].map { id =>
        val seed = if (id % 10 == 9) id - 1 else id
        val rnd = new java.util.Random(seed * 6364136223846793005L + 17L)
        val n = 12 + rnd.nextInt(30)
        val base = (0 until n).map(_ => vocab(rnd.nextInt(vocab.length)))
        val words = if (id % 10 == 9) base ++ Seq(vocab(((id % 8)).toInt)) else base
        (id, words.mkString(" "))
      }.toDF("doc_id", "text")
    for (src <- Seq("sat" -> docs, "drv" -> spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))) {
      val (nm, d) = src
      val sampled = d.select(col("doc_id"), col("text"))
        .orderBy(xxhash64(col("doc_id")), col("doc_id")).limit(2048)
      val sigs = graft.operators.DedupOps.minhashSignatures(
        graft.operators.DedupOps.hashedShingled(sampled, 3, "text"), 128, "hs")
        .select("sig").collect().map(_.getSeq[Long](0).toArray)
      val ests = sigs.sliding(2, 2).collect { case Array(a, b) =>
        (0 until 128).count(i => a(i) == b(i)).toDouble / 128
      }.toArray.filter(_ < 0.8).sorted
      def q(p: Int) = ests(math.min(ests.length - 1, ests.length * p / 100))
      val above42 = ests.count(_ >= 0.42).toDouble / ests.length
      val above30 = ests.count(_ >= 0.30).toDouble / ests.length
      println(f"$nm n=${ests.length} p50=${q(50)}%.3f p90=${q(90)}%.3f p95=${q(95)}%.3f p99=${q(99)}%.3f max=${ests.last}%.3f fracAbove0.42=$above42%.4f fracAbove0.30=$above30%.4f")
      val nDocs = d.count()
      for ((r, b) <- Seq((4, 32), (8, 16), (16, 8))) {
        val meanP = ests.map(j => 1.0 - math.pow(1.0 - math.pow(j, r), b)).sum / ests.length
        val perDoc = meanP * (nDocs - 1) / 2.0
        println(f"  ($r%2d,$b%2d) meanP=$meanP%.3e spuriousPerDoc=$perDoc%.4f")
      }
    }
    spark.stop()
  }
}
