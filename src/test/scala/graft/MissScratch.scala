package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnosis of the zipf_sf10 q_neardup_minhash single-pair
  * recall miss (docs 255508/255509, true jac 0.925): prints per-band
  * signature agreement for the pair under the production
  * MinHashSignature. If the 128 double-hashed rows were independent,
  * P(no band of 32 agrees) ≈ (1−0.925⁴)³² ≈ 5e-19 — a structural miss
  * here indicts the Kirsch–Mitzenmacher row construction, not chance.
  *
  * Usage: MissScratch <sfDir> <docA> <docB>
  */
object MissScratch {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val (ida, idb) = (args(1).toLong, args(2).toLong)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir)
      .filter(col("doc_id").isin(ida, idb))
    val sh = operators.DedupOps.hashedShingled(docs, 3)
    val sigs = operators.DedupOps.minhashSignatures(sh, 128, "hs")
      .select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val (sa, sb) = (sigs(ida), sigs(idb))
    val rowAgree = sa.indices.count(i => sa(i) == sb(i))
    println(s"[miss] row agreement: $rowAgree/128 (expected ~${(0.925 * 128).round})")
    val bands = (0 until 32).map { b =>
      (0 until 4).forall(r => sa(b * 4 + r) == sb(b * 4 + r))
    }
    println(s"[miss] agreeing bands (r=4,b=32): ${bands.count(identity)}/32")
    // run-length structure of disagreeing rows: double-hashing
    // correlation shows up as long contiguous runs
    val dis = sa.indices.filter(i => sa(i) != sb(i))
    println(s"[miss] disagreeing rows: ${dis.mkString(",")}")
    spark.stop()
  }
}
