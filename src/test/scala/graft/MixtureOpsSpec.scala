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

  test("rakeWeights: hand 2x2 IPF — column margins exact, rows within one half-step") {
    import graft.operators.MixtureOps
    // cells 30/10/10/10 raked to uniform 30/30 margins: pinned
    // scale-9 integers after 3 integer half-up rounds (the replay IS
    // the contract; the limit would be (20,10,10,20))
    val docs = (Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("lang", "source")
    val got = MixtureOps.rakeWeights(docs).orderBy("lang", "source")
      .as[(String, String, Long, Long, Double)].collect().toList
    assert(got.map(t => (t._1, t._2, t._3, t._4)) == List(
      ("a", "x", 30L, 19014084507L), ("a", "y", 10L, 10975609756L),
      ("b", "x", 10L, 10985915493L), ("b", "y", 10L, 19024390244L)))
    // the closing half-step scales COLUMNS, so column margins land on
    // the target exactly; rows are within one rescale of it
    val colSums = got.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(colSums == Map("x" -> 30000000000L, "y" -> 30000000000L))
    val rowSums = got.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(rowSums.values.forall(s => math.abs(s - 30000000000L) < 30000000L))
  }
}
