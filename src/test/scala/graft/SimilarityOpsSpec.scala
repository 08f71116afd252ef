package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

class SimilarityOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dot/norm: exact on hand-built vectors") {
    val df = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"), SimilarityOps.norm(col("embedding")).as("n"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 5.0 && got(2L) == 1.0)
  }

  test("bruteForceTopK: correct neighbor order on a tiny corpus") {
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),   // closest to 0
      (2L, Seq(0.0f, 1.0f)),   // orthogonal
      (3L, Seq(-1.0f, 0.0f))). // opposite
      toDF("vec_id", "embedding")
    val got = SimilarityOps.bruteForceTopK(df, col("vec_id") === 0, 3)
      .select("nn_id", "rank").as[(Long, Int)].collect().sortBy(_._2).map(_._1)
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("jlProject: one-hot → exactly ±scale, zero → zero, non-square dims rejected") {
    val df = Seq(
      (0L, Seq.tabulate(64)(i => if (i == 3) 1.0f else 0.0f)),
      (1L, Seq.fill(64)(0.0f))).toDF("vec_id", "embedding")
    val p = SimilarityOps.jlProject(df, 64, 16)
      .as[(Long, Long, Double)].collect()
    assert(p.length == 32)
    // one-hot: each output dim is sign(3,d)·1/√16 → magnitude exactly 0.25
    assert(p.filter(_._1 == 0L).forall(r => math.abs(r._3) == 0.25))
    assert(p.filter(_._1 == 1L).forall(_._3 == 0.0))
    // deterministic: a second run is bit-identical
    val p2 = SimilarityOps.jlProject(df, 64, 16).as[(Long, Long, Double)].collect()
    assert(p.sortBy(r => (r._1, r._2)).toSeq == p2.sortBy(r => (r._1, r._2)).toSeq)
    intercept[IllegalArgumentException] {
      SimilarityOps.jlProject(df, 64, 8) // √8 isn't exact → rejected
    }
  }

  test("jlDistortionPairs: identical pair nulls out, distinct pair certifies") {
    val v = Seq.tabulate(64)(i => (i % 5).toFloat)
    val w = Seq.tabulate(64)(i => ((i + 2) % 7).toFloat)
    // pair (0,1): identical → d2o = 0 → null ratio/flag (never ±∞);
    // pair (2,3): distinct → ratio computed, bound check boolean
    val df = Seq((0L, v), (1L, v), (2L, v), (3L, w)).toDF("vec_id", "embedding")
    val byVa = SimilarityOps.jlDistortionPairs(df)
      .as[(Long, Long, Double, Double, Option[Double], Option[Boolean])]
      .collect().map(r => r._1 -> ((r._5, r._6))).toMap
    assert(byVa(0L) == ((None, None)))
    assert(byVa(2L)._1.isDefined && byVa(2L)._2.isDefined)
  }

  test("mutualKnnGraph drops asymmetric hub edges, keeps mutual pairs") {
    // angles 0°, 10°, 30°: top-1(v2)=v1 (20° < 30°) but top-1(v1)=v0
    // (10° < 20°) → (1,2) is asymmetric and must NOT be an edge;
    // (0,1) is mutual. With k=2 every pair ranks, so (1,2) appears
    // with rank_ab=2 from v1's side and rank_ba=1 from v2's.
    def at(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val df = Seq((0L, at(0)), (1L, at(10)), (2L, at(30)))
      .toDF("vec_id", "embedding")
    val k1 = SimilarityOps.mutualKnnGraph(df, 1)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    assert(k1 == Set((0L, 1L)))
    val k2 = SimilarityOps.mutualKnnGraph(df, 2)
      .select("va", "vb", "rank_ab", "rank_ba")
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(k2 == Set((0L, 1L, 1, 1), (0L, 2L, 2, 2), (1L, 2L, 2, 1)))
  }

  test("ivf/pq fit clamps k to a degenerate fit sample instead of throwing") {
    // 12 vectors; ivf's mod-10 sample keeps 2 (< 16 cells), pq's mod-4
    // sample keeps 3 (< 16 codes) — localLloyd clamps, and at the
    // provable-containment settings (full probe / full shortlist) both
    // indexes must still reproduce brute force exactly.
    val r = new scala.util.Random(7)
    val df = (0L until 12L).map(i =>
      (i, Seq.fill(8)(r.nextFloat()))).toDF("vec_id", "embedding")
    val brute = SimilarityOps.bruteForceTopK(df, col("vec_id") < 3, 5)
      .select("q_id", "nn_id", "rank").as[(Long, Long, Int)].collect().toSet
    val ivf = SimilarityOps.ivfTopK(df, col("vec_id") < 3, 5,
      nCells = 16, nProbe = 16)
      .select("q_id", "nn_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(ivf == brute)
    // pq ranks by L2, not cosine — exact L2 truth computed in-test
    val vecs = df.as[(Long, Seq[Float])].collect().toMap
    def d2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val exactL2 = (0L until 3L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (d2(vecs(q), vecs(n)), n)).take(5)
        .zipWithIndex.map { case (n, i) => (q, n, i + 1) }
    }.toSet
    val pq = SimilarityOps.pqTopK(df, col("vec_id") < 3, 5,
      subspaces = 2, codebookK = 16, shortlist = 12)
      .select("q_id", "nn_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(pq == exactL2)
  }

  test("rrfFuse: hand-computed scores; L2 can disagree with cosine and fusion reflects it") {
    // ranking A: d1 > d2; ranking B: d2 > d1; d3 only in A
    val a = Seq((0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3)).toDF("q_id", "nn_id", "rank")
    val b = Seq((0L, 2L, 1), (0L, 1L, 2)).toDF("q_id", "nn_id", "rank")
    val got = SimilarityOps.rrfFuse(Seq(a, b), topK = 3)
      .select("nn_id", "rrf", "n_rankers", "fused_rank")
      .as[(Long, Double, Long, Int)].collect().sortBy(_._4)
    // d1: 1/61 + 1/62; d2: 1/62 + 1/61 (equal!) → tie broken by nn_id;
    // d3: 1/63, one ranker
    val s12 = 1.0 / 61 + 1.0 / 62
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(got(0)._2 == s12 && got(1)._2 == (1.0 / 62 + 1.0 / 61))
    assert(got(0)._3 == 2L && got(2)._3 == 1L && got(2)._2 == 1.0 / 63)
    // L2 and cosine genuinely rank differently when norms differ:
    // q=(1,0); cosine prefers the aligned far vector, L2 the close one
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(10.0f, 0.0f)),    // cosine sim 1.0, L2 dist 81
      (2L, Seq(0.9f, 0.3f))).toDF("vec_id", "embedding") // sim ~0.95, dist ~0.1
    val cosTop = SimilarityOps.bruteForceTopK(emb, col("vec_id") === 0, 2)
      .filter(col("rank") === 1).select("nn_id").as[Long].head()
    val l2Top = SimilarityOps.bruteForceTopKL2(emb, col("vec_id") === 0, 2)
      .filter(col("rank") === 1).select("nn_id").as[Long].head()
    assert(cosTop == 1L && l2Top == 2L)
  }

  test("cosineNearDups is symmetric-free (va < vb) and thresholded") {
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.001f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.cosineNearDups(df, 0.99)
      .select("va", "vb").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L)))
  }

  test("semanticDecontam: thresholded eval×train pairs on a tiny corpus") {
    // eval = even ids {0,2}, train = odd {1,3}; only vec 0 is near a
    // train vector: cos(0,1)≈0.994, cos(0,3)≈0.999; vec 2 orthogonal
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(1.0f, 0.05f)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.semanticDecontam(df,
        pmod(col("vec_id"), lit(2L)) === 0, 0.9)
      .select("eval_id", "train_id").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L), (0L, 3L)))
  }

  test("semanticDecontam equals exact cross-split all-pairs at sf0.001") {
    // recall proof on the real corpus: the LSH candidate stage must
    // surface EVERY eval×train pair at sim ≥ 0.4 (mirrors the
    // equality-as-recall gate oracle, pinned here engine-side)
    val emb = Tables.embeddings(spark, sf0)
    val isEval = pmod(col("vec_id"), lit(5L)) === 0
    val lsh = SimilarityOps.semanticDecontam(emb, isEval, 0.4)
      .select("eval_id", "train_id").as[(Long, Long)].collect().toSet
    val v = emb.select(col("vec_id"), col("embedding"),
      sqrt(graft.functions.ArrayDot(col("embedding"), col("embedding"))).as("nrm"))
    val exact = v.filter(isEval)
      .select(col("vec_id").as("eval_id"), col("embedding").as("ee"), col("nrm").as("ne"))
      .crossJoin(v.filter(!isEval)
        .select(col("vec_id").as("train_id"), col("embedding").as("et"), col("nrm").as("nt")))
      .filter(graft.functions.ArrayDot(col("ee"), col("et"))
        / (col("ne") * col("nt")) >= 0.4)
      .select("eval_id", "train_id").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
    assert(exact.nonEmpty)
  }

  test("ANN recall@10 vs brute force is usable on near-orthogonal data") {
    val emb = Tables.embeddings(spark, sf0)
    val brute = SimilarityOps.bruteForceTopK(emb, col("vec_id") < 10, 10)
      .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    val ann = SimilarityOps.annTopK(emb, col("vec_id") < 10, 10)
      .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ann).size.toDouble / brute.size
    info(f"ANN recall@10 = $recall%.3f (candidates ${ann.size})")
    // synthetic embeddings are near-orthogonal (max cosine ~0.5) — the
    // hardest case for hyperplane LSH. 16 tables × 6 bits with the
    // default radius-2 multi-probe reach recall 1.0 here; deterministic
    // hashes make the number fixed, so this is a real similarity-search
    // bar, not a smoke check.
    assert(recall >= 0.8, f"recall $recall%.3f")
  }

  test("lshCodes are deterministic and bounded") {
    val codes = SimilarityOps.lshCodes(Tables.embeddings(spark, sf0))
    val mx = codes.agg(max("code"), min("code")).as[(Long, Long)].head()
    assert(mx._1 < 64 && mx._2 >= 0)       // 6-bit codes
    val n = codes.groupBy("vec_id").count().select("count").distinct().as[Long].collect()
    assert(n.toSeq == Seq(16L))             // 16 tables per vector
  }

  test("IVF (KMeans-cell) ANN: recall@10 vs brute force, probed cells only") {
    val emb = Tables.embeddings(spark, sf0)
    val brute = SimilarityOps.bruteForceTopK(emb, col("vec_id") < 10, 10)
      .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    val ivf = SimilarityOps.ivfTopK(emb, col("vec_id") < 10, 10,
      nCells = 8, nProbe = 3)
    val got = ivf.select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    val recall = (brute & got).size.toDouble / brute.size
    info(f"IVF recall@10 = $recall%.3f (pairs ${got.size})")
    // near-orthogonal synthetic data is IVF's hardest case: an
    // oblivious 3-of-8-cell probe would land ~0.375 recall; the
    // measured 0.74 (deterministic Lloyd fit — was 0.75 under the
    // MLlib k-means|| fit it replaced) shows the quantizer adapting
    // to the data. Gate at the measured value so any fit/probe
    // regression fails loudly (deterministic hashes → a fixed fact).
    assert(recall >= 0.74, f"recall $recall%.3f")
    // every result ranks properly: k per query at most
    val counts = ivf.groupBy("q_id").count().select("count").as[Long].collect()
    assert(counts.forall(_ <= 10))
  }

  test("IVF pruned scale config (16 cells, 8 probes) certifies recall >= 0.9") {
    // the config a 100 TB deployment would run (probe half the cells →
    // half the exact-cosine work): deterministic recall ≥ 0.9 across
    // sf0.001/0.01/0.1 (0.91-0.93 under the old MLlib fit, 0.95 at
    // sf0.001 under the Lloyd fit; param scan in NOTES.md). The certified-
    // equality path is q_ann_ivf at nProbe = nCells (AnnExactRecallSpec).
    val emb = Tables.embeddings(spark, sf0)
    val brute = SimilarityOps.bruteForceTopK(emb, col("vec_id") < 10, 10)
      .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    val ivf = SimilarityOps.ivfTopK(emb, col("vec_id") < 10, 10,
      nCells = 16, nProbe = 8)
      .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    info(f"IVF(16,8) recall@10 = $recall%.3f")
    assert(recall >= 0.9, f"recall $recall%.3f")
  }

  test("pqTopK: recall@10 floors vs exact L2, deterministic across runs") {
    val emb = Tables.embeddings(spark, sf0)
    def exact: Set[(Long, Long)] = {
      val vecs = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      val d2 = aggregate(zip_with(col("eq"), col("en"),
        (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x)
      vecs.select(col("vec_id").as("q_id"), col("e").as("eq"))
        .filter(col("q_id") < 10)
        .crossJoin(vecs.select(col("vec_id").as("nn_id"), col("e").as("en")))
        .filter(col("q_id") =!= col("nn_id"))
        .withColumn("d2", d2)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("q_id")
            .orderBy(col("d2").asc, col("nn_id").asc)))
        .filter(col("rank") <= 10)
        .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    }
    val ex = exact
    val pq = SimilarityOps.pqTopK(emb, col("vec_id") < 10, 10)
      .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    val overall = (ex & pq).size
    val perQ = ex.groupBy(_._1).map { case (q, s) => (s & pq).size }
    info(s"PQ recall@10 = ${overall / 100.0} minQ = ${perQ.min}")
    // deterministic arithmetic → fixed facts at this corpus (measured
    // 90/100, min 8/10 at sf0.001 with the auto shortlist=200): the
    // assertions leave one hit of drift room before the q_ann_pq
    // certificate bound (5/10) is even approached
    assert(overall >= 85 && perQ.min >= 7,
      s"PQ recall degraded: $overall/100, minQ ${perQ.min}")
    // determinism: a second run is bit-identical
    val pq2 = SimilarityOps.pqTopK(emb, col("vec_id") < 10, 10)
      .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    assert(pq == pq2)
  }

  test("pqRecallCertificate: every query certifies at the gated bound") {
    val got = SimilarityOps.pqRecallCertificate(
      Tables.embeddings(spark, sf0), col("vec_id") < 10, 10, 0.5)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got.size == 10 && got.forall(_._4))
  }

  test("int8 quantization: error bounded by scale/254, zero vectors safe") {
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val qz = SimilarityOps.quantizeInt8(df)
    val err = SimilarityOps.dequantError(qz, df)
      .select("vec_id", "scale", "max_abs_err")
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(err(1L)._1 == 1.0 && err(1L)._2 <= 1.0 / 254 + 1e-12)
    assert(err(2L)._1 == 0.0 && err(2L)._2 == 0.0)
    val q1 = qz.filter(col("vec_id") === 1).select("q")
      .as[Seq[Int]].head()
    assert(q1 == Seq(127, -63, 32)) // -0.5*127 = -63.5 → floor(-63) half-up
  }

  test("dimensionZScore: stats over all dims, z from the published pair") {
    // dim0: {1, 3} → mean 2, std_pop 1 → z = ±1; dim1: {2, 2} → std 0 →
    // z null (explicit zero-variance guard — engines disagree on x/0.0);
    // dim2 contributes to stats but is excluded from output by outDims=2
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 9.0f)),
      (2L, Seq(3.0f, 2.0f, -9.0f))).toDF("vec_id", "embedding")
    val got = SimilarityOps.dimensionZScore(df, outDims = 2)
      .orderBy("vec_id", "dim")
      .select("vec_id", "dim", "x", "z")
      .as[(Long, Int, Double, Option[Double])].collect().toList
    assert(got == List(
      (1L, 0, 1.0, Some(-1.0)), (1L, 1, 2.0, None),
      (2L, 0, 3.0, Some(1.0)), (2L, 1, 2.0, None)))
  }

  test("powerIterationPC: unit top component on the dominant axis, shift-invariant") {
    def mk(rows: Seq[(Long, Array[Float])]) = rows.toDF("vec_id", "embedding")
    val rows = (1 to 40).map { i =>
      val main = (if (i % 2 == 0) 5.0 else -5.0) + i * 0.01
      (i.toLong, Array(main.toFloat, ((i % 7) * 0.1).toFloat,
        ((i % 3) * 0.05).toFloat))
    }
    def pc(df: org.apache.spark.sql.DataFrame): Array[Double] =
      SimilarityOps.powerIterationPC(df)
        .orderBy("dim").as[(Int, Double)].collect().map(_._2)
    val p = pc(mk(rows))
    // unit norm (to rounding scale), dominated by dim 0 (variance ~25
    // vs ~0.1)
    assert(math.abs(p.map(x => x * x).sum - 1.0) < 1e-4)
    assert(math.abs(p(0)) > 0.99, p.toList.toString)
    assert(math.abs(p(1)) < 0.12 && math.abs(p(2)) < 0.12)
    // covariance is shift-invariant: adding a constant per dim must not
    // move the component (implicit centering works); tolerance = float
    // input noise + the round-6 publication grid
    val shifted = rows.map { case (id, a) =>
      (id, a.zipWithIndex.map { case (x, j) => x + 10f * (j + 1) })
    }
    val p2 = pc(mk(shifted))
    assert(p.zip(p2).forall { case (a, b) => math.abs(a - b) < 5e-6 },
      p.zip(p2).toList.toString)
  }

  test("mmrRerank: redundancy penalty reorders a hand-built candidate set") {
    // query (1,0); candidates: a=(1,0) rel 1.0, b=(.8,.6) rel .8,
    // c=(.6,.8) rel .6; sims: a·b=.8, a·c=.6, b·c=.96 (all at 6dp).
    // Greedy λ=.7: pick a (0.7); then b: .7·.8−.3·.8=.32 beats
    // c: .7·.6−.3·.6=.24; then c pays its .96 closeness to b.
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0f)),
      (2L, Seq(0.8f, 0.6f)), (3L, Seq(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val got = graft.operators.SimilarityOps.mmrRerank(emb,
        col("vec_id") === 0, topC = 3, select = 3, lambda = 0.7)
      .orderBy("mmr_rank")
      .as[(Long, Int, Long, Double)].collect().toList
    val sB = 0.7 * 0.8 - (1.0 - 0.7) * 0.8   // same IEEE dag as the engine
    val sC = 0.7 * 0.6 - (1.0 - 0.7) * 0.96
    assert(got == List((0L, 1, 1L, 0.7 * 1.0), (0L, 2, 2L, sB),
      (0L, 3, 3L, sC)))
    // without the penalty the pure-relevance order would be a, b, c by
    // rel alone — identical here; the penalty's effect shows in the
    // score gap: sC < 0.7·0.6 − 0.3·0.6 (what c would pay vs a only)
    assert(sC < 0.7 * 0.6 - (1.0 - 0.7) * 0.6)
  }

  test("semDedup: within-cluster drop rule, smallest earlier neighbor wins") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),    // group A anchor (kmeans init c0)
      (1L, Seq(0.0f, 1.0f)),    // group B anchor (kmeans init c1)
      (2L, Seq(0.99f, 0.01f)),  // near-dup of 0
      (3L, Seq(0.01f, 0.99f)),  // near-dup of 1
      (4L, Seq(0.98f, 0.03f))). // near-dup of 0 (and of 2; 0 is smaller)
      toDF("vec_id", "embedding")
    val out = SimilarityOps.semDedup(emb, dims = 2, k = 2, iters = 2,
      tau = 0.9)
    val detail = out.filter(col("vec_id").isNotNull)
      .select("vec_id", "dup_of").as[(Long, Long)].collect().toMap
    assert(detail == Map(2L -> 0L, 3L -> 1L, 4L -> 0L))
    val summary = out.filter(col("vec_id").isNull)
      .select("n", "n_kept").as[(Long, Long)].collect().toSet
    assert(summary == Set((3L, 1L), (2L, 1L))) // {0,2,4} keep 0; {1,3} keep 1
  }

  test("chooseSemDedupK: smallest rung under the pair budget; escalation; steepest fallback") {
    // 64 points in 8 tight, far-apart blobs (centers 10·e_j over 8
    // dims); ids interleave blobs so the first-k init seeds one
    // centroid per blob at k=8. Fitted pair loads are then
    // deterministic at the probed rungs: k=8 recovers the blobs
    // exactly (load = 8·C(8,2) = 224); k=2's load is ≥ 2·C(32,2) = 992
    // whatever the 2-centroid split looks like (convexity floor at the
    // balanced split) and ≤ C(64,2) = 2016.
    val pts = (0 until 64).map { i =>
      val blob = i % 8
      val v = Array.fill(8)(0.0f)
      v(blob) = 10.0f
      v((blob + 1) % 8) = (i / 8) * 0.01f // deterministic within-blob jitter
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    def choose(budget: Long) = SimilarityOps.chooseSemDedupK(pts,
      dims = 8, iters = 2, maxPairs = budget, ladder = Seq(2, 8, 16))
    assert(choose(2016L) === 2)  // any k=2 split fits → smallest rung
    assert(choose(500L) === 8)   // 992+ > 500 skips rung 2; 224 fits
    assert(choose(10L) === 16)   // nothing censused fits → steepest
  }

  test("semDedupAdaptive: driver-scale corpora keep k=4 with semDedup-identical output") {
    // the census' smallest rung wins whenever the corpus' WORST-CASE
    // pair count fits the budget (C(500,2) ≈ 1.2e5 ≪ 5e7), so the
    // adaptive gate must reproduce the fixed-k=4 operator bit for bit
    // — this is what keeps the driver-SF oracle answers unchanged
    val emb = Tables.embeddings(spark, sf0)
    assert(SimilarityOps.chooseSemDedupK(emb) === 4)
    val cols = Seq("cluster", "vec_id", "dup_of", "sim", "n", "n_kept")
      .map(col)
    val fixed = SimilarityOps.semDedup(emb, dims = 8, k = 4,
      iters = 2, tau = 0.4).select(cols: _*).collect().toSet
    val adaptive = SimilarityOps.semDedupAdaptive(emb, dims = 8,
      iters = 2, tau = 0.4).select(cols: _*).collect().toSet
    assert(adaptive === fixed)
  }

  test("powerIterationPC2: recovers both axes of an anisotropic cloud; components orthogonal") {
    // axis-aligned cloud (zero cross-covariance): spread along e1
    // (±8, ±4) ≫ e2 (±3, ±1.5), nothing on e3/e4 → pc1 = ±e1,
    // pc2 = ±e2, and u1 ⟂ u2
    val pts = Seq(
      Seq(8.0f, 0.0f, 0.0f, 0.0f), Seq(-8.0f, 0.0f, 0.0f, 0.0f),
      Seq(4.0f, 0.0f, 0.0f, 0.0f), Seq(-4.0f, 0.0f, 0.0f, 0.0f),
      Seq(0.0f, 3.0f, 0.0f, 0.0f), Seq(0.0f, -3.0f, 0.0f, 0.0f),
      Seq(0.0f, 1.5f, 0.0f, 0.0f), Seq(0.0f, -1.5f, 0.0f, 0.0f))
    val df = pts.zipWithIndex.map { case (e, i) => (i.toLong, e) }
      .toDF("vec_id", "embedding")
    // 15 rounds: the gate's 5 are enough for the oracle replay (both
    // engines walk the same partial convergence), but the AXIS
    // assertion wants the fixpoint ((λ2/λ1)^15 ≈ 1e-11)
    val got = SimilarityOps.powerIterationPC2(df, iters = 15)
      .orderBy("dim").select("pc1", "pc2")
      .as[(Double, Double)].collect()
    val (pc1, pc2) = (got.map(_._1), got.map(_._2))
    // axis recovery (sign-free) at the published precision
    assert(math.abs(math.abs(pc1(0)) - 1.0) < 1e-4 &&
      math.abs(pc1(1)) < 1e-3 && math.abs(pc1(2)) < 1e-6)
    assert(math.abs(math.abs(pc2(1)) - 1.0) < 1e-4 &&
      math.abs(pc2(0)) < 1e-3 && math.abs(pc2(2)) < 1e-6)
    val dot = pc1.zip(pc2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-3)
  }

  test("mrlRecall: hand-built corpus where the 2-dim prefix swaps one neighbor") {
    // q = e1; full sims: a 1.0, c ≈ 0.688, b ≈ 0.158 → full top-2 {a, c}
    // 2-dim prefix: a' 1.0, b' ≈ 0.993, c' ≈ 0.949 → trunc top-2 {a, b}
    // → 1 of 2 survives: recall 0.5, mirrored by the ALL row
    val df = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // query
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // a: identical
      (2L, Seq(0.8f, 0.1f, -5.0f, 0.0f)),  // b: prefix-close, full-far
      (3L, Seq(0.9f, 0.3f, 0.9f, 0.0f)))   // c: full-close, prefix-third
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.mrlRecall(df, col("vec_id") === 0, k = 2,
        truncDims = 2)
      .select("q_id", "n_hits", "recall")
      .as[(Option[Long], Long, Double)].collect().toSet
    assert(got == Set((Some(0L), 1L, 0.5), (None, 1L, 0.5)))
    // identical prefix ordering (no third vector pulls rank) → recall 1
    val same = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.5f, 0.5f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val g2 = SimilarityOps.mrlRecall(same, col("vec_id") === 0, k = 2,
        truncDims = 2)
      .filter(col("q_id").isNull).select("recall")
      .as[Double].collect().toList
    assert(g2 == List(1.0))
  }

  test("mmdLinear: detects a planted shift, exactly zero under H0, drops remainders") {
    // A at [1,0], B at [0,1], gammaDen=2: within-kernels exp(0)=1,
    // cross exp(-1)=0.367879441 (9dp) → h = 2 − 2·0.367879441 per quad,
    // mmd2 = 1.264241118 → 1.264241 at 6dp
    def emb(rows: Seq[(Long, Seq[Float], Int)]) =
      rows.toDF("vec_id", "embedding", "label")
    val shifted = emb(
      (0 until 8).map(i => (i.toLong * 2, Seq(1.0f, 0.0f), 0)) ++
      (0 until 8).map(i => (i.toLong * 2 + 1, Seq(0.0f, 1.0f), 1)))
    val got = SimilarityOps.mmdLinear(shifted, "vec_id", "embedding",
        col("label") === 0, buckets = 1, gammaDen = 2.0)
      .as[(Long, Double, Double, Double)].collect().toList
    assert(got == List((4L, 1.264241, 1.0, 0.367879)))
    // identical distributions: every kernel equal → mmd2 exactly 0
    val same = emb(
      (0 until 8).map(i => (i.toLong * 2, Seq(1.0f, 0.0f), 0)) ++
      (0 until 8).map(i => (i.toLong * 2 + 1, Seq(1.0f, 0.0f), 1)))
    val g2 = SimilarityOps.mmdLinear(same, "vec_id", "embedding",
        col("label") === 0, buckets = 1, gammaDen = 2.0)
      .as[(Long, Double, Double, Double)].collect().toList
    assert(g2 == List((4L, 0.0, 1.0, 1.0)))
    // ragged sides: 3 vs 2 pairable → 2 pairs → 1 quad; the 3rd A
    // vector and the odd pair remainder drop
    val ragged = emb(Seq(
      (0L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0),
      (4L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(0.0f, 1.0f), 1), (3L, Seq(0.0f, 1.0f), 1)))
    val g3 = SimilarityOps.mmdLinear(ragged, "vec_id", "embedding",
        col("label") === 0, buckets = 1, gammaDen = 2.0)
      .select("n_quads").as[Long].collect().toList
    assert(g3 == List(1L))
  }

  test("anisotropyReport: parallel vectors A = 1, orthogonal A = 0, singleton nulls") {
    val vecs = Seq(
      (0, 1L, Seq(1f, 0f, 0f, 0f)), (0, 2L, Seq(1f, 0f, 0f, 0f)), // parallel
      (1, 3L, Seq(1f, 0f, 0f, 0f)), (1, 4L, Seq(0f, 1f, 0f, 0f)), // orthogonal
      (2, 5L, Seq(0f, 0f, 1f, 0f))                                // singleton
    ).toDF("label", "vec_id", "embedding")
    val got = SimilarityOps.anisotropyReport(vecs, dims = 4)
      .orderBy("label")
      .as[(Int, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toList
    assert(got == List(
      (0, 2L, Some(1.0), Some(1.0), Some(1.0)),
      (1, 2L, Some(0.0), Some(1.0), Some(0.0)),
      (2, 1L, None, Some(1.0), None)))
  }
}
