package graft

import graft.operators.MixtureOps
import org.apache.spark.sql.functions._

class MixtureOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf0)
  private val targets = (0 until 20).map(i => s"src$i" -> (1.0 + i % 4) / 50.0).toMap

  test("mixtureWeights: fractions sum to 1, weight inverts to the target, unlisted → 0") {
    val w = MixtureOps.mixtureWeights(docs, targets).collect()
    assert(w.length == 20)
    val actualSum = w.map(_.getAs[Double]("actual_frac")).sum
    assert(math.abs(actualSum - 1.0) < 1e-9)
    assert(math.abs(w.map(_.getAs[Double]("target_frac")).sum - 1.0) < 1e-9)
    // weight · mass / total ≡ target_frac (the defining identity)
    val total = w.map(_.getAs[Long]("mass")).sum.toDouble
    w.foreach { r =>
      val back = r.getAs[Double]("weight") * r.getAs[Long]("mass") / total
      assert(math.abs(back - r.getAs[Double]("target_frac")) < 1e-12)
    }
    // a domain missing from the config gets weight 0
    val partial = MixtureOps.mixtureWeights(docs, targets - "src3")
      .filter($"domain" === "src3").head()
    assert(partial.getAs[Double]("target_frac") == 0.0)
    assert(partial.getAs[Double]("weight") == 0.0)
  }

  test("mixtureResample: copies ∈ {⌊w⌋, ⌊w⌋+1}, deterministic, realizes the mixture") {
    val w = MixtureOps.mixtureWeights(docs, targets)
      .select("domain", "weight").as[(String, Double)].collect().toMap
    val out = MixtureOps.mixtureResample(docs, targets)
    val copies = out.groupBy("doc_id", "domain").agg(max("copy_no").as("n"))
      .as[(Long, String, Long)].collect()
    copies.foreach { case (_, dom, n) =>
      val f = math.floor(w(dom)).toLong
      assert(n == f || n == f + 1, s"$dom weight ${w(dom)} emitted $n copies")
    }
    // deterministic: a second evaluation is identical
    val a = out.as[(Long, String, Long)].collect().sorted.toSeq
    val b = MixtureOps.mixtureResample(docs, targets)
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(a == b)
    // realized char mass tracks the target (hash threshold ⇒ within a
    // few docs' worth of mass per domain on 25-doc domains)
    val mass = docs.select($"doc_id", $"source", $"n_chars")
      .as[(Long, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val realized = copies.groupBy(_._2).map { case (dom, rs) =>
      dom -> rs.map { case (id, d, n) => mass((id, d)) * n }.sum.toDouble
    }
    val realTotal = realized.values.sum
    targets.foreach { case (dom, tf) =>
      val rf = realized.getOrElse(dom, 0.0) / realTotal
      assert(math.abs(rf - tf) < 0.02, s"$dom realized $rf vs target $tf")
    }
    // a dropped domain (weight 0) emits nothing
    val none = MixtureOps.mixtureResample(docs, targets - "src7")
      .filter($"domain" === "src7").count()
    assert(none == 0L)
  }
}
