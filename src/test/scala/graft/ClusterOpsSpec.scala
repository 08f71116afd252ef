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

  test("kmeansAssign: bit-identical assignments to kmeans at any k (encoding parity)") {
    // same init, same decimal-mean updates, same distance dags, same
    // lowest-index ties — arrAssign only changes the plan ENCODING
    // (nested-array literal + array_position instead of the O(k²)
    // when-cascade), so assignments must match exactly. Odd k probes a
    // non-gate configuration.
    val emb = Tables.embeddings(spark, sf0)
    for (k <- Seq(4, 7)) {
      val a = ClusterOps.kmeans(emb, "vec_id", "embedding",
          dims = 8, k = k, iters = 2)
        .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
      val b = ClusterOps.kmeansAssign(emb, "vec_id", "embedding",
          dims = 8, k = k, iters = 2)
        .as[(Long, Int)].collect().toMap
      assert(a == b, s"k=$k: scalable encoding diverged from cascade")
    }
  }

  test("kmeansAssign: array_position tie breaks to the lowest centroid index") {
    // the midpoint corpus from the kmeans tie test — first-index-of-min
    // must reproduce the when-cascade's tie rule (and the oracle's
    // min(cl)-at-min-d)
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(10.0f, 0.0f)),
      (2L, Array(-1.0f, 0.0f)), (3L, Array(11.0f, 0.0f)),
      (4L, Array(5.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = ClusterOps.kmeansAssign(pts, "vec_id", "embedding",
        dims = 2, k = 2, iters = 1)
      .orderBy("vec_id").as[(Long, Int)].collect()
    assert(got(4)._2 == 0)
  }

  test("kmeansAssign: n < k degrades to one cluster per point (ladder-fallback shape)") {
    // a census fallback rung can exceed the corpus: init takes all n
    // rows as centroids, every point is distance 0 to its own vector,
    // and (dense ids) cluster == vec_id — the exact `vec_id < k`
    // take-all the oracle replays
    val pts = (0L to 4L).map(i =>
      (i, Array(i.toFloat, (i * i).toFloat))).toDF("vec_id", "embedding")
    val got = ClusterOps.kmeansAssign(pts, "vec_id", "embedding",
        dims = 2, k = 2048, iters = 2)
      .orderBy("vec_id").as[(Long, Int)].collect()
    assert(got.forall { case (id, cl) => cl.toLong == id })
  }

  test("gridDensityClusters: diagonal cells merge, far blob separate, sparse = noise") {
    // eps=1 grid. Blob A: 3 pts in cell (0,0) + 3 pts in DIAGONAL cell
    // (1,1) -> one cluster. Blob B: 3 pts in far cell (5,5). One lone
    // point in (3,0) -> sparse -> NULL.
    def pt(id: Long, x: Double, y: Double) = (id, Array(x.toFloat, y.toFloat))
    val emb = (Seq(pt(1, 0.1, 0.1), pt(2, 0.5, 0.5), pt(3, 0.9, 0.2),
      pt(4, 1.1, 1.9), pt(5, 1.5, 1.5), pt(6, 1.2, 1.7),
      pt(7, 5.5, 5.5), pt(8, 5.1, 5.9), pt(9, 5.9, 5.1),
      pt(10, 3.5, 0.5))).toDF("vec_id", "embedding")
    val got = ClusterOps.gridDensityClusters(emb, eps = 1.0, minPts = 3)
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r._4).toMap
    val a = got(1L)
    assert(a.isDefined && (1L to 6L).forall(got(_) == a), got.toString)
    val bb = got(7L)
    assert(bb.isDefined && bb != a && got(8L) == bb && got(9L) == bb)
    assert(got(10L).isEmpty)
    // blob B's isolated dense cell keeps its packed cell id
    assert(bb.get == (5L + 4096L) * 8192L + 5L + 4096L)
  }

  test("kCenterGreedy: hand-checked farthest-point trajectory + coverage row") {
    // 1-D grid points 0, 10, 4, 1 (scale 1): start at id 0, then the
    // farthest point 10 (d²=100), then 4 (min-dist² 16), leaving 1 as
    // the worst-covered point (d²=1 to center 0) = the cover radius²
    val emb = Seq((0L, Seq(0f)), (1L, Seq(10f)), (2L, Seq(4f)), (3L, Seq(1f)))
      .toDF("vec_id", "embedding")
    val got = graft.operators.ClusterOps.kCenterGreedy(emb, k = 3, scale = 1.0)
      .orderBy("sel_rank")
      .as[(Int, Option[Long], Long)].collect().toList
    assert(got == List((0, Some(0L), 0L), (1, Some(1L), 100L),
      (2, Some(2L), 16L), (3, None, 1L)))
  }

  test("silhouette: symmetric two-cluster case by hand; degenerate -> 0") {
    // init = vecs 0,1 → c0 = (0,0), c1 = (10,0); one Lloyd step moves
    // them to (0,1) and (10,1). Every point then has a = 1,
    // b = √101 → s = (√101 − 1)/√101 ≈ 0.900496 — identical for all 4
    val emb = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(10.0f, 0.0f)),
      (2L, Seq(0.0f, 2.0f)), (3L, Seq(10.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.operators.ClusterOps
      .silhouette(emb, "vec_id", "embedding", dims = 2, k = 2, iters = 1)
      .orderBy("cluster")
      .as[(Int, Long, Double)].collect().toList
    assert(got == List((0, 2L, 0.900496), (1, 2L, 0.900496)))
    // all points identical: every distance 0 → per-point s defined 0
    val flat = Seq((0L, Seq(1.0f, 1.0f)), (1L, Seq(1.0f, 1.0f)),
      (2L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val z = graft.operators.ClusterOps
      .silhouette(flat, "vec_id", "embedding", dims = 2, k = 2, iters = 1)
      .as[(Int, Long, Double)].collect().toList
    assert(z.forall(_._3 == 0.0))
  }
}
