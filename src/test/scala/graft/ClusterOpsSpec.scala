package graft

import graft.operators.ClusterOps
import org.apache.spark.sql.functions._

class ClusterOpsSpec extends SparkSpec {
  import spark.implicits._

  test("kmeans separates two obvious clusters and converges to their means") {
    // ids 0,1 seed the two centroids; points tightly packed around
    // (0,0) and (10,10) — one iteration already lands the exact means
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(10.0f, 10.0f)),
      (2L, Array(0.5f, 0.0f)), (3L, Array(0.0f, 0.5f)),
      (4L, Array(10.5f, 10.0f)), (5L, Array(10.0f, 9.5f))
    ).toDF("vec_id", "embedding")
    val got = ClusterOps.kmeans(pts, "vec_id", "embedding",
        dims = 2, k = 2, iters = 2)
      .orderBy("vec_id")
      .as[(Long, Int, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(0, 1, 0, 0, 1, 1))
    // converged centroids: c0 = (1/6, 1/6), c1 = (61/6, 59/6); the
    // published dist2 must be the distance to the FINAL centroid
    val d0 = math.pow(0.0 - 1.0 / 6, 2) + math.pow(0.0 - 1.0 / 6, 2)
    assert(math.abs(got.head._3 - BigDecimal(d0).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("kmeans argmin tie breaks to the lowest centroid index") {
    // point 4 sits exactly between the two seed clusters; with k=2 and
    // symmetric clouds the centroids stay symmetric, so the midpoint
    // stays equidistant and must land in cluster 0
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(10.0f, 0.0f)),
      (2L, Array(-1.0f, 0.0f)), (3L, Array(11.0f, 0.0f)),
      (4L, Array(5.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = ClusterOps.kmeans(pts, "vec_id", "embedding",
        dims = 2, k = 2, iters = 1)
      .orderBy("vec_id").as[(Long, Int, Double)].collect()
    assert(got(4)._2 == 0) // tie → index 0, mirroring the oracle CASE
  }

  test("kmeans on sf0.001 embeddings: all k clusters populated (gate invariant)") {
    val emb = Tables.embeddings(spark, sf0)
    val got = ClusterOps.kmeans(emb, "vec_id", "embedding",
      dims = 8, k = 4, iters = 2)
    val sizes = got.groupBy("cluster").count()
      .as[(Int, Long)].collect().toMap
    assert(sizes.keySet == Set(0, 1, 2, 3), sizes.toString)
    assert(sizes.values.sum == emb.count())
  }
}
