package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.WelfordAgg
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is exposed as a named query over the
  * driver-generated testdata (`/root/testdata/sf*`), paired — where the
  * semantics are ANSI-SQL-expressible — with a DuckDB oracle in
  * [[oracleSql]]. Column names and rounding are aligned on both sides
  * because the driver hash-compares values after sorting columns by name.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The a3_p1 hypothesis-testing pipeline end-to-end: tokenize → dense
    * top-k rel-freqs → per-word two-predictor standardized OLS.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_reg_multi")(spark, "/root/testdata/sf0.001")

  /** Fixed target mixture for the data-mixing gates: domain srcN gets
    * mass fraction (1 + N % 4) / 50 — deliberately skewed vs the
    * corpus' near-uniform actual distribution so weights land on both
    * sides of 1.0 (down- AND up-sampling paths exercised). Σ over the
    * 20 sources = 50/50 = 1. The oracle recomputes the same fractions
    * from the domain name.
    */
  private val mixTargets: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> (1.0 + i % 4) / 50.0).toMap

  /** q_lm_nll keep threshold (on the published 6-dp avg_nll) — sized so
    * the synthetic corpus lands docs on BOTH sides of the filter.
    */
  private val LmKeepBelow: Double = 6.0

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.6 T1 + §2.4 A1/A2 + §2.8 F1/F2: tokenize → count → top-k.
    "q_topk_words" -> ((s, dir) => TextOps.topKWords(Tables.documents(s, dir), 100)),
    // Zipf rank–frequency fit over the top-100 tokens: OLS of ln(freq)
    // on ln(rank) — the whole-corpus health diagnostic (natural text
    // sits near slope −1; template spam bends away). Corpus-sized work
    // is ONE partial-combined word count; the fit runs on 100 rows.
    "q_zipf" -> ((s, dir) =>
      TextOps.zipfFit(Tables.documents(s, dir), topN = 100)),
    // Text relevance scoring — TF-IDF and Okapi BM25 top-3 terms per
    // doc. Both ride the native TopKPerKey operator for the per-doc
    // ranking; ranking keys are rounded to 9 decimals so ln()'s libm
    // ulp can never decide membership cross-engine.
    "q_tfidf" -> ((s, dir) =>
      TextOps.tfidfTopTerms(Tables.documents(s, dir), 3)
        .select(col("doc_id"), col("word"), col("tf"),
          round(col("tfidf"), 6).as("tfidf"))
        .orderBy("doc_id", "word")),
    "q_bm25" -> ((s, dir) =>
      TextOps.bm25TopTerms(Tables.documents(s, dir), 3)
        .select(col("doc_id"), col("word"), col("tf"), col("dl"),
          round(col("score"), 6).as("score"))
        .orderBy("doc_id", "word")),
    // Beyond the reference: Count-Min-Sketch heavy hitters (relative
    // frequency ≥ 2%) — sampled candidate discovery + one mergeable
    // fixed-size sketch aggregation; estimates equal exact counts on
    // this corpus, so the exact-count oracle doubles as the accuracy
    // proof.
    "q_heavy_hitters" -> ((s, dir) =>
      TextOps.heavyHitters(Tables.documents(s, dir), minFreq = 0.02)
        .orderBy("word")),
    // §2.4 A3 + §2.8 F3: per-letter mean/std-dev over dense per-doc counts.
    "q_char_hist" -> ((s, dir) => TextOps.charHistogram(Tables.documents(s, dir))),
    // §2.3 J4: set difference (custkeys with orders − high-balance custkeys).
    "q_set_diff" -> ((s, dir) => RelationalOps.setDifference(
      Tables.orders(s, dir).select(col("o_custkey").as("custkey")),
      Tables.customer(s, dir).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey")),
      "custkey").orderBy("custkey")),
    // §2.2 P5: one-pass hash-bucket sample + streaming-shaped agg.
    "q_hash_sample" -> ((s, dir) =>
      RelationalOps.hashBucketSample(Tables.events(s, dir), "user_id", 16, 3)
        .agg(count(lit(1)).as("n"),
          decMean(col("value")).as("mean_value"),
          round(stddev_pop(col("value")), 4).as("std_value"))),
    // §2.3 J5 + §2.2 P6: two-pass sampler as a semi-join.
    "q_semi_sample" -> ((s, dir) =>
      RelationalOps.semiJoinSample(Tables.events(s, dir), "user_id", 16, 3)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_tx"), decMean(col("value")).as("mean_value"))
        .orderBy("user_id")),
    // §2.6 T5: seeded exact-size-k uniform sample — the reference's
    // shuffle-and-take-prefix sampler as a distributed top-k by
    // engine-portable hash order (TakeOrderedAndProject, no full sort).
    "q_uniform_sample" -> ((s, dir) =>
      RelationalOps.uniformSampleExact(Tables.events(s, dir), col("event_id"), 1000, "graft")
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 4).as("value"))
        .orderBy("event_id")),
    // Deterministic epoch-shuffle training order: seeded md5 shuffle
    // key → shard (mod 16) → per-shard dense position → round-robin
    // interleaved global_pos. No global sort: the only wide op is the
    // 16-way shard window.
    "q_train_order" -> ((s, dir) =>
      RelationalOps.trainingOrder(
          Tables.documents(s, dir).select("doc_id"), col("doc_id"), "ep1", 16)
        .select(col("doc_id"), col("shard"), col("pos_in_shard"), col("global_pos"))
        .orderBy("doc_id")),
    // §2.6 T5 (fraction form): seeded ~1% scan-local uniform sample +
    // running stats — the one-pass stream-sampler shape.
    "q_sample_frac" -> ((s, dir) =>
      RelationalOps.uniformSampleFraction(Tables.events(s, dir), col("event_id"), 0.01, "graft")
        .agg(count(lit(1)).as("n"), decMean(col("value")).as("mean_value"))),
    // Stratified (balanced) sampling: exactly 50 events per event_type
    // by seeded hash order — the per-language/per-label balanced draw
    // of training-data curation, planned via the native bounded-heap
    // top-k-per-key operator.
    "q_stratified_sample" -> ((s, dir) =>
      RelationalOps.stratifiedSampleExact(
        Tables.events(s, dir).select("event_id", "user_id", "event_type", "value"),
        Seq("event_type"), col("event_id"), 50, "strat")
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 4).as("value"))
        .orderBy("event_type", "event_id")),
    // §2.4 A5: deterministic last-rating-wins dedup.
    "q_dedup_last" -> ((s, dir) => Ratings.deduped(s, dir).orderBy("user_id", "item_id")),
    // §2.2 P3 + §2.4 A8: support filter (items with ≥25 distinct raters).
    "q_support_items" -> ((s, dir) => RelationalOps.supportFilter(
      Ratings.deduped(s, dir), "item_id", "user_id", 25).orderBy("item_id")),
    // §2.4 A7: distinct key collection.
    "q_distinct_users" -> ((s, dir) =>
      Tables.events(s, dir).select("user_id").distinct().orderBy("user_id")),
    // §2.4 A4: single-pass Welford mean/std as a custom Aggregator (UDAF).
    "q_welford" -> ((s, dir) => {
      val welford = udaf(WelfordAgg)
      Tables.events(s, dir).groupBy("event_type")
        .agg(welford(col("value")).as("w"))
        .select(col("event_type"), col("w.n").as("n"),
          round(col("w.mean"), 4).as("mean_value"),
          round(col("w.std"), 4).as("std_value"))
        .orderBy("event_type")
    }),
    // §2.3 J3 + §2.4 A13: COO matrix multiply (equi-join on the inner
    // dim + hash agg). M = label<5 slice, N = transposed label>=5 slice;
    // vec_id bounded so the oracle output stays O(10^4) at every sf.
    "q_matmul" -> ((s, dir) => {
      // One parquet scan for both operands: explode to COO once, then
      // split by label in memory (the naive two-branch form scans and
      // explodes the embeddings twice).
      val coo = CacheScope.autoRelease(
        Tables.embeddings(s, dir).filter(col("vec_id") < 100)
          .select(col("vec_id"), col("label"), posexplode(col("embedding")))
          .select(col("vec_id"), col("label"), col("pos").cast("long").as("j"),
            col("col").cast("double").as("v")))
      val m = coo.filter(col("label") < 5).select(col("vec_id").as("i"), col("j"), col("v"))
      val n = coo.filter(col("label") >= 5).select(col("j"), col("vec_id").as("k"), col("v"))
      MatrixOps.multiply(m, n)
        .select(col("i"), col("k"), round(col("v"), 6).as("v"))
        .orderBy("i", "k")
    }),
    // §2.3 J1 + §2.8 F8/F9 + §2.6 T2: flagship a3_p1 pipeline — dense
    // rel-freqs, per-word standardized OLS via corr sufficient stats.
    "q_reg_simple" -> ((s, dir) =>
      RegressionOps.simpleRegression(regObs(s, dir), Some(RegK))
        .select(col("word"), col("n"), round(col("beta"), 6).as("beta"),
          round(col("t"), 6).as("t"))
        .orderBy(col("beta").desc, col("word"))),
    "q_reg_multi" -> ((s, dir) =>
      RegressionOps.multiRegression(regObs(s, dir), Some(RegK))
        .select(col("word"), col("n"), round(col("beta1"), 6).as("beta1"),
          round(col("beta2"), 6).as("beta2"), round(col("t1"), 6).as("t1"))
        .orderBy(col("beta1").desc, col("word"))),
    // p-values (Student-t sf via commons-math), oracle-checked against
    // the exact elementary t-CDF series evaluated by a DuckDB recursive
    // CTE (see oracleSql) and Breeze-pinned in RegressionOpsSpec.
    "q_reg_pvalues" -> ((s, dir) =>
      RegressionOps.multiRegression(regObs(s, dir), Some(RegK))
        .select(col("word"), round(col("t1"), 6).as("t1"),
          round(col("p1"), 6).as("p1"), round(col("p1_bonf"), 6).as("p1_bonf"))
        .orderBy(col("word"))),
    // §2.3 J2 + §2.4 A10/A11 + §2.6: a3_p2 recommender — capped
    // neighbor lists per target item.
    "q_cf_sims" -> ((s, dir) =>
      CFOps.topNeighbors(CFOps.itemSimilarities(
        CFOps.meanCentered(CFOps.supportFiltered(Ratings.dedupedByItem(s, dir))), CfTargets))
        .select(col("t_item"), col("item_id"), round(col("sim"), 6).as("sim"),
          col("n_common"))
        .orderBy("t_item", "item_id")),
    // The SAME similarity pipeline through the Zipf-head escape hatch
    // (Params.saltedSupport: two-level salted counts + join-back
    // instead of partition-frame windows — bounded tasks under a
    // dominant key, CFOps scaladoc). Output is bit-identical to the
    // window form, so it shares q_cf_sims' ORACLE: the driver proves
    // plan-form equivalence end to end, not just the EdgeCasesSpec
    // corpus.
    "q_cf_sims_salted" -> ((s, dir) => {
      val p = CFOps.Params(saltedSupport = true)
      CFOps.topNeighbors(CFOps.itemSimilarities(
        CFOps.meanCentered(CFOps.supportFiltered(Ratings.dedupedByItem(s, dir), p), p),
        CfTargets, p), p)
        .select(col("t_item"), col("item_id"), round(col("sim"), 6).as("sim"),
          col("n_common"))
        .orderBy("t_item", "item_id")
    }),
    // §2.4 A12: weighted-average predictions with pass-through.
    "q_cf_recommend" -> ((s, dir) =>
      CFOps.recommend(Ratings.dedupedByItem(s, dir), CfTargets)
        .select(col("t_item"), col("user_id"), round(col("pred"), 4).as("pred"))
        .orderBy("t_item", "user_id")),
    // One ALS alternation at rank 2 (MLlib's recsys inner step):
    // deterministic item-factor seed grid, per-user ridge normal
    // equations solved closed-form. Int64-exact accumulators make the
    // pre-rounding doubles bit-identical across engines.
    "q_als_round" -> ((s, dir) =>
      CFOps.alsUserFactors(Ratings.deduped(s, dir), lambda = 0.1)
        .orderBy("user_id")),
    // The ITEM half-step closing the alternation: user factors join
    // back into ratings (the real ALS iteration's factor join), one
    // item-keyed aggregate of decimal-cast double products, same
    // closed-form solve.
    "q_als_item" -> ((s, dir) => {
      val r = Ratings.deduped(s, dir)
      CFOps.alsItemFactors(r, CFOps.alsUserFactors(r, lambda = 0.1))
        .orderBy("item_id")
    }),
    // Training-data pipeline: exact dedup keep-list.
    "q_exact_dedup" -> ((s, dir) =>
      DedupOps.exactDedup(Tables.documents(s, dir)).orderBy("rep_doc_id")),
    // Part_2 Q3b/Q4 + near-dup: MinHash+LSH candidates, exact-verify ≥0.8.
    // Oracle is the exact all-pairs answer — equality IS the recall test.
    "q_neardup_minhash" -> ((s, dir) =>
      DedupOps.verifiedNearDups(Tables.documents(s, dir))
        .select(col("da"), col("db"), round(col("jac"), 6).as("jac"))
        .orderBy("da", "db")),
    // Incremental ingest dedup: near-dup pairs touching the mod-7
    // "new batch" only — batch bands broadcast against the corpus
    // band table, never a corpus self-join. Oracle = the exact
    // all-pairs answer filtered to pairs with a new side (equality =
    // recall proof, the q_neardup_minhash construction).
    "q_incr_neardup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      DedupOps.incrementalNearDups(
          docs.filter(pmod(col("doc_id"), lit(7L)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(7L)) === 0))
        .select(col("da"), col("db"), round(col("jac"), 6).as("jac"))
        .orderBy("da", "db")
    }),
    // STREAMING incremental near-dup: the mod-7 batch arrives as a
    // real file stream, minhashed in-flight, banded against the
    // static corpus band table (stateless stream-static join),
    // cross-band candidates deduped in state, verified exact. Oracle =
    // exact cross (new×old) pairs — equality is the recall proof.
    "q_stream_incr_neardup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val isNew = pmod(col("doc_id"), lit(7L)) === 0
      val pairs = graft.streaming.StreamingOps.streamingNearDups(
        Tables.documentsStream(s, dir).filter(isNew), docs.filter(!isNew))
      val qn = s"graft_stream_neardup_${StreamSeq.incrementAndGet()}"
      val q = pairs.writeStream.format("memory").queryName(qn)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(qn)
        .select(col("da"), col("db"), round(col("jac"), 6).as("jac"))
        .orderBy("da", "db")
    }),
    // Incremental cluster MAINTENANCE: old assignments (clustered
    // without the mod-7 batch) + the batch's pairs folded in through
    // the batch-bounded supernode CC. Oracle = from-scratch clustering
    // of the full corpus — hash equality proves maintenance ≡
    // recompute (the q_incr_agg construction).
    "q_incr_clusters" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val isNew = pmod(col("doc_id"), lit(7L)) === 0
      val old = docs.filter(!isNew)
      val oldClusters = DedupOps.nearDupClusters(DedupOps.verifiedNearDups(old))
      val incr = DedupOps.incrementalNearDups(old, docs.filter(isNew))
      DedupOps.incrementalClusters(oldClusters, incr.select("da", "db"))
        .orderBy("doc_id")
    }),
    // The reference's PUBLISHED banding design point (`Part_2.pdf` p.5-6
    // Q4b): ~500-hash signatures banded r=18 × b=28 for the t≈0.9
    // S-curve (sigLen 504 = the exact r·b multiple). Same exact
    // all-pairs oracle shape as q_neardup_minhash — equality proves the
    // published parameterization's recall on this corpus ABOVE its own
    // design threshold: minJac 0.92 > t ≈ (1/28)^(1/18) ≈ 0.83 puts
    // every gated pair where the curve's per-pair miss probability is
    // ≤ (1−0.92¹⁸)²⁸ ≈ 6·10⁻⁴ (and the deterministic signatures make
    // the outcome a testable fact, not a draw). Gating at 0.85 instead
    // FAILS at sf0.1 — two jac=8/9 pairs land in the soft zone below
    // t≈0.9 and are probabilistically dropped, which is the published
    // trade-off working as specified, not a recall bug; the threshold
    // choice encodes exactly that boundary. Corpus pair values are
    // small-fraction rationals (…11/12, 12/13…), so 0.92 cannot sit on
    // a boundary.
    "q_neardup_ref" -> ((s, dir) =>
      DedupOps.verifiedNearDups(Tables.documents(s, dir),
          sigLen = 504, r = 18, bands = 28, minJac = 0.92)
        .select(col("da"), col("db"), round(col("jac"), 6).as("jac"))
        .orderBy("da", "db")),
    // Near-dup CLUSTERS: connected components over the verified pair
    // graph — transitive closure into (doc, cluster-representative)
    // rows, the form a dedup pipeline actually consumes. The oracle
    // recomputes components from the exact all-pairs graph with a
    // recursive CTE, so both the pair recall AND the closure must match.
    "q_neardup_clusters" -> ((s, dir) =>
      DedupOps.nearDupClusters(
          DedupOps.verifiedNearDups(Tables.documents(s, dir)))
        .orderBy("doc_id")),
    // Canonical-doc manifest: the dedup pipeline's KEEP step — one
    // longest-member representative per near-dup cluster (tie: lowest
    // doc_id), singletons keep themselves. The oracle replays the
    // full chain: exact pairs → recursive closure → rank → union.
    // PRODUCTION SHAPE: this gate recomputes the whole LSH pipeline
    // (minhash → banding → verify → propagation) inline because the
    // harness requires each query be a pure function of the source
    // tables. A real pipeline materializes the cluster assignment ONCE
    // (write nearDupClusters' output as a keyed table / Delta snapshot)
    // and every consumer — canonical selection, filtering, dedup joins —
    // reads that table; at 100 TB the clustering is a run-once batch
    // job, never a per-consumer recomputation.
    "q_canonical_docs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      DedupOps.canonicalDocs(docs,
          DedupOps.nearDupClusters(DedupOps.verifiedNearDups(docs)))
        .orderBy("doc_id")
    }),
    // Exact n-gram Jaccard pairs (inverted index) — the brute-force
    // baseline the LSH path approximates.
    "q_ngram_jaccard" -> ((s, dir) =>
      DedupOps.ngramJaccardPairs(Tables.documents(s, dir), minJac = 0.5)
        .select(col("da"), col("db"), round(col("jac"), 6).as("jac"))
        .orderBy("da", "db")),
    // Overlap-coefficient (containment) pairs — the dedup criterion
    // Jaccard misses: a short doc embedded verbatim in a long one has
    // containment 1 but Jaccard → 0. Same inverted-index plan, scored
    // inter / min(|A|,|B|).
    "q_overlap_pairs" -> ((s, dir) =>
      DedupOps.overlapPairs(Tables.documents(s, dir), minOverlap = 0.8)
        .select(col("da"), col("db"), round(col("ovl"), 6).as("ovl"))
        .orderBy("da", "db")),
    // SimHash 60-bit fingerprints (engine-portable md5 bit construction).
    "q_simhash" -> ((s, dir) =>
      DedupOps.simhash(Tables.documents(s, dir)).orderBy("doc_id")),
    // SimHash near-dup PAIRS via pigeonhole blocking (Manku WWW'07):
    // Hamming ≤ 3 forces agreement on one of four 15-bit blocks, so
    // candidates come from a (block, value) equality self-join — never
    // all-pairs. The oracle IS the quadratic scan; hash equality is a
    // structural recall proof.
    "q_simhash_pairs" -> ((s, dir) =>
      DedupOps.simhashPairs(Tables.documents(s, dir), maxHamming = 3)
        .orderBy("id_a", "id_b")),
    // The SAME simhash computed through the pure-SQL surface: the
    // md5_simhash kernel registered by GraftExtensions, called from
    // spark.sql over a temp view — proves a SQL-only user (JDBC, SQL
    // files) gets the identical native expression the DataFrame API
    // uses. Hash-matches q_simhash's oracle.
    "q_sql_simhash" -> ((s, dir) => {
      GraftExtensions.register(s)
      Tables.documents(s, dir).createOrReplaceTempView("graft_documents")
      s.sql("""
        SELECT doc_id,
               md5_simhash(regexp_extract_all(lower(text), '[a-z0-9]+', 0), 60) AS sig
        FROM graft_documents
        WHERE size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) > 0
        ORDER BY doc_id""")
    }),
    // Unicode canonicalization (native NfcNormalize kernel): every
    // doc's text with a deliberately DECOMPOSED suffix (e + U+0301)
    // and a singleton compat point (U+212B → U+00C5) pushed through
    // NFC; md5 of the normalized bytes gates exact byte equality, the
    // octet counts prove bytes really moved (n_norm < n_raw). Map-only.
    "q_normalize_text" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(col("text"), lit(" cafe\u0301 \u212B")).as("raw"))
        .select(col("doc_id"),
          octet_length(col("raw")).as("n_raw_bytes"),
          octet_length(graft.functions.NfcNormalize(col("raw")))
            .as("n_norm_bytes"),
          md5(graft.functions.NfcNormalize(col("raw")).cast("binary"))
            .as("norm_md5"))
        .orderBy("doc_id")),
    // Similarity search: brute-force cosine top-10 for queries vec_id<10.
    "q_cosine_nn" -> ((s, dir) =>
      SimilarityOps.bruteForceTopK(Tables.embeddings(s, dir), col("vec_id") < 10, 10)
        .select(col("q_id"), col("nn_id"), round(col("sim"), 6).as("sim"), col("rank"))
        .orderBy("q_id", "rank")),
    // Mutual-kNN graph (k=5): undirected edges where each endpoint is
    // in the other's top-5 — the hub-pruned edge set graph dedup
    // clusters on. Exact baseline (brute-force lists + one k·n-keyed
    // self-join); ANN lists slot into the same join at corpus scale.
    "q_knn_graph" -> ((s, dir) =>
      SimilarityOps.mutualKnnGraph(Tables.embeddings(s, dir), k = 5)
        .select(col("va"), col("vb"), round(col("sim"), 6).as("sim"),
          col("rank_ab"), col("rank_ba"))
        .orderBy("va", "vb")),
    // Hybrid-retrieval rank fusion: RRF over the exact cosine and L2
    // rankings for queries vec_id < 10 — the score-free combiner for
    // rankers with incommensurable scores. One (q,d) aggregate +
    // TopKPerKey; rrf published raw (2-ranker sum = one commutative
    // IEEE add).
    "q_rrf_fusion" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cos = SimilarityOps.bruteForceTopK(emb, col("vec_id") < 10, 10)
      val l2 = SimilarityOps.bruteForceTopKL2(emb, col("vec_id") < 10, 10)
      SimilarityOps.rrfFuse(Seq(cos, l2), topK = 10)
        .select(col("q_id"), col("nn_id"), col("rrf"), col("n_rankers"),
          col("fused_rank"))
        .orderBy("q_id", "fused_rank")
    }),
    // Diversity re-ranking: MMR greedy selection (λ=0.7, 5 of top-10)
    // over the brute-force cosine lists — the redundancy-aware rerank
    // between retrieval and a context window. Full selection
    // trajectory + scores gated.
    "q_mmr" -> ((s, dir) =>
      SimilarityOps.mmrRerank(Tables.embeddings(s, dir),
          col("vec_id") < 10, topC = 10, select = 5, lambda = 0.7)
        .orderBy("q_id", "mmr_rank")),
    // SemDeDup (Abbas et al. 2023): k-means buckets play the LSH-band
    // role, cosine checked only within a cluster — pairs are
    // Σ C(n_c, 2), never corpus². Oracle replays the ENTIRE pipeline
    // (Lloyd fit → assign → within-cluster cosine → drop rule), so the
    // gate proves fit, bucketing AND dedup semantics together.
    "q_semdedup" -> ((s, dir) =>
      SimilarityOps.semDedup(Tables.embeddings(s, dir), dims = 8, k = 4,
          iters = 2, tau = 0.4)
        .orderBy(col("cluster"), col("vec_id").asc_nulls_last,
          col("dup_of").asc_nulls_last)),
    // Embedding-cosine near-dup pairs via LSH candidates + exact verify
    // (no cross join anywhere in the plan). The oracle is the exact
    // all-pairs answer — equality doubles as the recall proof, like
    // q_neardup_minhash. 0.4 because the synthetic embeddings carry no
    // planted near-dups — max pairwise cosine is ~0.5.
    "q_cosine_neardup" -> ((s, dir) =>
      SimilarityOps.cosineNearDupsLsh(Tables.embeddings(s, dir), 0.4)
        .select(col("va"), col("vb"), round(col("sim"), 6).as("sim"))
        .orderBy("va", "vb")),
    // Semantic decontamination: eval split = vec_id % 5 == 0, train =
    // rest; paraphrase-level leakage the n-gram overlap check misses.
    // Equality with the exact all-pairs cross join = recall proof
    // (same construction as q_cosine_neardup).
    "q_semantic_decontam" -> ((s, dir) =>
      SimilarityOps.semanticDecontam(Tables.embeddings(s, dir),
        pmod(col("vec_id"), lit(5L)) === 0, 0.4)
        .select(col("eval_id"), col("train_id"), round(col("sim"), 6).as("sim"))
        .orderBy("eval_id", "train_id")),
    // ANN via signed-random-projection LSH — hash-bucketed candidates
    // with radius-2 multi-probe. At the default 16×6 config the
    // candidates provably contain the true top-10 on this corpus, so
    // the oracle is the EXACT brute-force top-k: hash equality is the
    // recall certificate (recall also floor-gated in SimilarityOpsSpec).
    "q_ann_lsh" -> ((s, dir) =>
      SimilarityOps.annTopK(Tables.embeddings(s, dir), col("vec_id") < 10, 10)
        .select(col("q_id"), col("nn_id"), round(col("sim"), 6).as("sim"), col("rank"))
        .orderBy("q_id", "rank")),
    // ANN via IVF (MLlib KMeans coarse quantizer, nProbe cells/query).
    // Certified like q_ann_lsh: at nProbe = nCells the candidate set
    // provably contains the exact top-10 (full cell coverage), so the
    // oracle is the EXACT brute-force top-k and hash equality certifies
    // the whole fit→assign→probe→rank pipeline loses nothing. Full
    // probing is the only containment point on THIS corpus — the
    // synthetic embeddings are near-orthogonal, the adversarial case
    // for any coarse quantizer (a measured param scan: (16,12) misses
    // 1% at sf0.1). The pruned scale config (16 cells, 8 probes) holds
    // a deterministic recall ≥ 0.9 at every sf — gated in
    // SimilarityOpsSpec and trended in NOTES.md.
    "q_ann_ivf" -> ((s, dir) =>
      SimilarityOps.ivfTopK(Tables.embeddings(s, dir), col("vec_id") < 10, 10,
        nCells = 8, nProbe = 8)
        .select(col("q_id"), col("nn_id"), round(col("sim"), 6).as("sim"), col("rank"))
        .orderBy("q_id", "rank")),
    // ANN via product quantization (ADC shortlist + exact re-rank):
    // the COMPRESSION tier — 8-byte codes, table-lookup scoring. Gate =
    // exact-NN anchor (oracle-recomputed) + per-query recall@10 >= 0.5
    // certificate (measured floors 0.7-0.9, pinned in spec).
    "q_ann_pq" -> ((s, dir) =>
      SimilarityOps.pqRecallCertificate(Tables.embeddings(s, dir),
          col("vec_id") < 10, 10, minRecall = 0.5)
        .orderBy("q_id")),
    // Text analysis: marker-based language ID (argmax + und fallback).
    "q_lang_id" -> ((s, dir) =>
      TextAnalysisOps.langId(Tables.documents(s, dir)).orderBy("doc_id")),
    // Quality features + pure-arithmetic composite score.
    "q_quality" -> ((s, dir) =>
      TextAnalysisOps.qualityScore(Tables.documents(s, dir))
        .select(col("doc_id"), col("n_tokens"),
          round(col("punct_ratio"), 6).as("punct_ratio"),
          round(col("stop_ratio"), 6).as("stop_ratio"),
          round(col("score"), 6).as("score"))
        .orderBy("doc_id")),
    // Gopher structural quality rules: exact-int rule flags + keep.
    // Thresholds chosen so every rule visibly bites on this corpus
    // (word count [30,80], mean word length [4.0,5.0] tenths).
    "q_gopher_rules" -> ((s, dir) =>
      TextAnalysisOps.gopherRules(Tables.documents(s, dir),
          minWords = 30, maxWords = 80,
          minMeanLenTenths = 40, maxMeanLenTenths = 50)
        .orderBy("doc_id")),
    // Annotation QA: Cohen's kappa between the langId labeler and the
    // gold lang column — multi-class 'ALL' row + one-vs-rest rows.
    "q_kappa" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      EvalOps.cohenKappa(
          TextAnalysisOps.langId(docs)
            .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")),
          col("lang_pred"), col("lang"))
        .orderBy("label")
    }),
    // Whitespace + BPE-ish token counting.
    "q_token_counts" -> ((s, dir) =>
      TextAnalysisOps.tokenCounts(Tables.documents(s, dir))
        .select(col("doc_id"), col("ws_tokens"), col("bpe_tokens"),
          round(col("chars_per_token"), 6).as("chars_per_token"))
        .orderBy("doc_id")),
    // Document chunking: 32-token windows with 8-token overlap — the
    // pre-embedding split; map-only, no shuffle.
    "q_chunk" -> ((s, dir) =>
      TextAnalysisOps.chunks(Tables.documents(s, dir), 32, 8)
        .orderBy("doc_id", "chunk_no")),
    // Sequence packing: the corpus as ONE virtual token stream split
    // into 256-token training sequences, one row per (sequence,
    // doc-span). The distributed two-phase prefix sum must reproduce
    // the oracle's single global window cumsum exactly.
    "q_pack_sequences" -> ((s, dir) =>
      TextAnalysisOps.packSequences(Tables.documents(s, dir), 256)
        .orderBy("chunk_id", "doc_id")),
    // PII redaction over an inline corpus with planted identifiers (the
    // synthetic docs carry no PII; the literal table is the reference's
    // S4 source shape). Redacted text + per-kind counts, both oracled.
    "q_pii_redact" -> ((s, dir) => {
      import s.implicits._
      TextAnalysisOps.redactPii(PiiRows.toDF("doc_id", "text"))
        .orderBy("doc_id")
    }),
    // Winnowing-style min-hash fingerprint over word 4-gram shingles.
    "q_fingerprint" -> ((s, dir) =>
      TextAnalysisOps.fingerprints(Tables.documents(s, dir)).orderBy("doc_id")),
    // Flagship training-data curation pipeline: exact-dedup to group
    // representatives → drop the higher id of every verified near-dup
    // pair → quality-score floor → language tag. One composed plan of
    // the dedup/quality/language operators, oracle-checked end to end.
    "q_curation" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val reps = DedupOps.exactDedup(docs).select(col("rep_doc_id").as("doc_id"))
      val nd = DedupOps.verifiedNearDups(docs)
        .select(col("db").as("doc_id")).distinct()
      val q = TextAnalysisOps.qualityScore(docs)
        .select(col("doc_id"), col("score"))
      val l = TextAnalysisOps.langId(docs).select("doc_id", "lang_pred")
      docs.select("doc_id")
        .join(reps, "doc_id")
        .join(nd, Seq("doc_id"), "left_anti")
        .join(q, "doc_id").filter(col("score") >= 0.5)
        .join(l, "doc_id")
        .select(col("doc_id"), round(col("score"), 6).as("score"), col("lang_pred"))
        .orderBy("doc_id")
    }),
    // Curation pipeline capstone #2: the training-set DRAW — a seeded,
    // engine-portable exact-size sample of the curation survivors
    // (every real pipeline ends with "give me k curated docs").
    "q_curation_sample" -> ((s, dir) => {
      val survivors = queries("q_curation")(s, dir).select("doc_id", "score", "lang_pred")
      RelationalOps.uniformSampleExact(survivors, col("doc_id"), 100, "train")
        .orderBy("doc_id")
    }),
    // Training-mixture draw: WEIGHTED sample without replacement
    // (Efraimidis–Spirakis), weights = doc length — the length-
    // proportional / source-reweighted draw every mixture pipeline
    // runs. Planned as TakeOrderedAndProject like q_uniform_sample.
    "q_weighted_sample" -> ((s, dir) =>
      RelationalOps.weightedSampleExact(
        Tables.documents(s, dir).select("doc_id", "source", "n_chars"),
        col("doc_id"), col("n_chars"), 30, "mix")
        .orderBy("doc_id")),
    // Balanced AND weighted: exactly 20 docs per language, each drawn
    // length-proportionally (A-ES within group via the native
    // TopKPerKey operator).
    "q_stratified_weighted" -> ((s, dir) =>
      RelationalOps.stratifiedWeightedSampleExact(
        Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars"),
        Seq("lang"), col("doc_id"), col("n_chars"), 20, "mixstrat")
        .orderBy("lang", "doc_id")),
    // Embedding storage path: symmetric int8 quantization + per-vector
    // dequantization-error certificate (bounded by scale/254).
    "q_quantize" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val qz = SimilarityOps.quantizeInt8(emb)
      SimilarityOps.dequantError(qz, emb)
        .join(qz.select(col("vec_id"),
          aggregate(col("q"), lit(0L), (a, x) => a + x.cast("long")).as("sum_q")),
          "vec_id")
        .select(col("vec_id"), round(col("scale"), 6).as("scale"), col("sum_q"),
          round(col("max_abs_err"), 6).as("max_abs_err"))
        .orderBy("vec_id")
    }),
    // Gopher-style repetition quality rules: top-token dominance +
    // duplicated-2-gram fraction per doc, with a keep flag on the
    // unrounded values.
    "q_repetition" -> ((s, dir) =>
      TextAnalysisOps.repetitionStats(Tables.documents(s, dir)).orderBy("doc_id")),
    // Test-set decontamination: train docs (doc_id % 7 != 0) sharing
    // ≥ 30% of their 3-gram shingles with any doc of the eval slice
    // (doc_id % 7 == 0). The eval posting list broadcasts — the scale
    // shape of checking a petabyte corpus against benchmark suites.
    "q_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      DedupOps.contaminatedPairs(
        docs.filter(pmod(col("doc_id"), lit(7L)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(7L)) === 0), minFrac = 0.3)
        .select(col("train_id"), col("eval_id"), round(col("frac"), 6).as("frac"))
        .orderBy("train_id", "eval_id")
    }),
    // Time-series densification: per-user 6-hour bucket counts with
    // zero-filled gaps between each user's first and last event — the
    // explode runs on the per-key span table, never the event stream.
    "q_fill_gaps" -> ((s, dir) =>
      TemporalOps.fillGaps(Tables.events(s, dir), Seq("user_id"), "ts")
        .orderBy("user_id", "bucket_us")),
    // Hopping-window aggregation: 6-hour windows every 3 hours — each
    // event lands in exactly window/slide = 2 windows, generated INLINE
    // at the scan (no join, no window-axis table); one window-keyed
    // partial-combined exchange. fillGaps' tumbling buckets are the
    // slide == window degenerate case.
    "q_hop_window" -> ((s, dir) =>
      TemporalOps.hopWindowStats(Tables.events(s, dir), "ts", "value")
        .orderBy("win_start_us")),
    // Triangle counting over the synthetic crawl graph: undirected
    // simple projection (normalize + distinct), wedge join + closing-
    // edge join — three keyed exchanges, one shared edge persist.
    // Counted once per triangle at its lowest vertex.
    "q_triangles" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val n = docs.agg(max("doc_id")).head().getLong(0) + 1 // dense ids
      val nodes = docs.select(col("doc_id").as("node"))
      GraphOps.triangleCounts(GraphOps.syntheticEdges(nodes, n))
        .orderBy("node")
    }),
    // Bounded-horizon EWMA smoothing: 6-lag truncation, α = ½ — every
    // weight a power of two, so scaling is EXACT and the published
    // smoothed value needs no rounding: bit-identical in any engine.
    "q_ewma" -> ((s, dir) =>
      TemporalOps.ewma(Tables.events(s, dir).filter(col("user_id") < 30),
          Seq("user_id"), "ts", "value", "event_id")
        .select(col("user_id"), col("event_id"), col("value"), col("ewma"))
        .orderBy("user_id", "event_id")),
    // HITS hubs/authorities over the same synthetic crawl graph as
    // q_pagerank: 2 unnormalized scatter/gather rounds, BIGINT-exact
    // (normalization is a per-round positive scalar — ratios gate).
    "q_hits" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val n = docs.agg(max("doc_id")).head().getLong(0) + 1 // dense ids
      val nodes = docs.select(col("doc_id").as("node"))
      GraphOps.hits(nodes, GraphOps.syntheticEdges(nodes, n), rounds = 2)
        .select(col("node").as("doc_id"), col("hub"), col("auth"))
        .orderBy("doc_id")
    }),
    // Market-basket association rules at the pair tier: parts that
    // co-occur in the same order, with support / confidence / lift.
    // Engine generates pairs INSIDE each basket row (no corpus
    // self-join); the oracle IS the naive self-join — equality proves
    // the in-row generation complete.
    "q_item_assoc" -> ((s, dir) =>
      RelationalOps.assocRules(Tables.lineitem(s, dir), "l_orderkey",
          "l_partkey", minSupport = 2)
        .orderBy("item_a", "item_b")),
    // SCD type-2 dimension build: per-user event_type timelines
    // compressed to validity intervals (gaps-and-islands + lead).
    "q_scd2" -> ((s, dir) =>
      TemporalOps.scd2(Tables.events(s, dir).filter(col("user_id") < 40),
          Seq("user_id"), "ts", "event_id", "event_type")
        .orderBy("user_id", "version")),
    // Unpivot/melt — the inverse reshape of q_pivot: lineitem's four
    // metric columns to (metric, value) long form, values pass-through
    // exact. Plans as a single Expand projection — no shuffle at all.
    "q_unpivot" -> ((s, dir) =>
      Tables.lineitem(s, dir).filter(col("l_orderkey") % 97 === 0)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric")),
    // Hive-style partitioned layout + partition PRUNING — the #1 scan
    // optimization at 100 TB: the lang='en' read must touch only the
    // en/ directory (PartitionFilters in the scan node, pinned by
    // PlanShapeSpec), never a corpus-wide scan + filter.
    "q_partition_prune" -> ((s, dir) => {
      val path = s"/tmp/graft_src_${new java.io.File(dir).getName}/docs_partitioned"
      Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars")
        .write.mode("overwrite").partitionBy("lang").parquet(path)
      s.read.parquet(path).filter(col("lang") === "en")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),
    // ANALYZE-style column profile: min/max/nulls/exact-NDV for the
    // four lineitem metric columns in ONE scan (multi-distinct plans
    // as a single Expand), melted to long form row-locally.
    "q_profile" -> ((s, dir) =>
      RelationalOps.profile(Tables.lineitem(s, dir),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_name")),
    // Distribution-shape companion to q_profile: equi-width histograms
    // for two lineitem metrics in ONE scan — the row-local (col, bin)
    // fan-out keeps the exchange at (cols × bins) partial rows;
    // floor(x/w) in double is engine-exact.
    "q_histogram" -> ((s, dir) =>
      RelationalOps.histogram(Tables.lineitem(s, dir),
          Seq("l_extendedprice" -> 5000.0, "l_quantity" -> 5.0))
        .orderBy("col_name", "bin")),
    // Exact pairwise Pearson correlations of the four lineitem metrics
    // in ONE aggregate pass (all moments as exact decimal sums; only
    // the closed-form corr is double). Feature-redundancy screen.
    "q_corr_matrix" -> ((s, dir) =>
      RelationalOps.correlationMatrix(Tables.lineitem(s, dir),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_a", "col_b")),
    // CDC snapshot diff: two deterministic snapshots of orders — keys
    // missing from old (mod-11) read as inserts, keys missing from new
    // (mod-13) as deletes, mod-7 price bumps as updates — classified by
    // ONE full-outer key join; unchanged keys dropped.
    "q_snapshot_diff" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val prev = ord.filter(col("o_orderkey") % 11 =!= 0)
      val cur = ord.filter(col("o_orderkey") % 13 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + lit(1.0))
            .otherwise(col("o_totalprice")))
      RelationalOps.snapshotDiff(prev, cur, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),
    // Overlapping-interval union per user: each event opens a VARIABLE
    // half-open interval (10-30 min, deterministic in event_id — long
    // intervals genuinely swallow later shorts, exercising the cummax);
    // overlap-connected sets merge, exact epoch-micros spans published.
    "q_interval_merge" -> ((s, dir) =>
      TemporalOps.intervalMerge(Tables.events(s, dir), Seq("user_id"),
          "event_id", unix_micros(col("ts")),
          unix_micros(col("ts")) +
            (lit(600L) + col("event_id") % 1200L) * 1000000L)
        .orderBy("user_id", "start_us")),
    // OHLC candles: first/last/min/max value per (event_type, 6 h
    // bucket) — order-aware aggregation as ONE hash aggregate
    // (min_by/max_by over the packed order), no window, no sort.
    "q_ohlc" -> ((s, dir) =>
      TemporalOps.ohlc(Tables.events(s, dir), Seq("event_type"),
          "ts", "event_id", "value", 21600L * 1000000L)
        .orderBy("event_type", "bucket_us")),
    // VWAP per synthetic symbol (partkey mod 100) per calendar month:
    // decimal-exact sums feed the published ratio, one hash aggregate.
    // First gate exercising the l_shipdate date column (UTC calendar
    // extraction portability).
    "q_vwap" -> ((s, dir) =>
      TemporalOps.vwap(Tables.lineitem(s, dir)
            .withColumn("symbol", pmod(col("l_partkey"), lit(100L))),
          Seq("symbol"), "l_shipdate", "l_extendedprice", "l_quantity")
        .orderBy("symbol", "y", "m")),
    // MERGE INTO (SCD1 upsert): deterministic change set — mod-13
    // deletes, mod-7 replacements, mod-97 fresh-key inserts — applied
    // by anti-join + union; the oracle rebuilds the merged table
    // declaratively.
    "q_merge_upsert" -> ((s, dir) => {
      val base = Tables.orders(s, dir)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val changes = base.filter(col("o_orderkey") % 13 === 0)
        .withColumn("__del", lit(true))
        .unionByName(base
          .filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 13 =!= 0)
          .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
            (col("o_totalprice") + lit(2.5)).as("o_totalprice"),
            lit(false).as("__del")))
        .unionByName(base.filter(col("o_orderkey") % 97 === 0)
          .select((col("o_orderkey") + lit(100000000L)).as("o_orderkey"),
            lit("N").as("o_orderstatus"),
            (col("o_totalprice") + lit(0.25)).as("o_totalprice"),
            lit(false).as("__del")))
      RelationalOps.mergeUpsert(base, changes, Seq("o_orderkey"), "__del")
        .orderBy("o_orderkey")
    }),
    // Expectation-suite data-quality report: five rules (pk unique,
    // two fk integrity, one range, one sign) — each ONE aggregate or
    // anti-join, report constant-sized at any corpus scale.
    "q_dq_checks" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val cust = Tables.customer(s, dir)
      DataQualityOps.report(Seq(
        DataQualityOps.uniqueKey(ord, "orders_pk_unique", "o_orderkey"),
        DataQualityOps.refIntegrity(li, "lineitem_orders_fk", "l_orderkey",
          ord, "o_orderkey"),
        DataQualityOps.refIntegrity(ord, "orders_customer_fk", "o_custkey",
          cust, "c_custkey"),
        DataQualityOps.expectAll(li, "l_quantity_in_1_30",
          col("l_quantity").between(1, 30)),
        DataQualityOps.expectAll(ord, "o_totalprice_positive",
          col("o_totalprice") > 0)))
        .orderBy("rule")
    }),
    // Purged time-block folds (horizon-leakage guard): 6-hour blocks
    // mod 5, 15-minute embargo purged at every block edge; per-fold
    // stats + an arithmetic no-leak certificate. Map-only integer
    // arithmetic on epoch micros.
    "q_time_folds" -> ((s, dir) => {
      val B = 21600000000L // 6 h in µs
      val E = 900000000L // 15 min in µs
      TemporalOps.purgedTimeFolds(Tables.events(s, dir), "ts", 5, B, E)
        .groupBy("fold")
        .agg(count(lit(1)).as("n"),
          min(pmod(unix_micros(col("ts")), lit(B))).as("min_off"),
          max(pmod(unix_micros(col("ts")), lit(B))).as("max_off"))
        .withColumn("no_leak",
          col("fold").isNull || (col("min_off") >= E && col("max_off") < B - E))
        .orderBy(col("fold").asc_nulls_first)
    }),
    // ε-DP count release: per-event-type counts + seeded Laplace(1/ε)
    // noise (inverse-CDF on the md5-open uniform, ln term rounded 9dp
    // for engine parity, raw-double publication).
    "q_dp_counts" -> ((s, dir) =>
      DataQualityOps.dpNoisyCounts(Tables.events(s, dir), "event_type",
          eps = 0.5, seed = "dp1")
        .orderBy("event_type")),
    // Link prediction (Liben-Nowell/Kleinberg): common-neighbor count
    // + Jaccard for non-adjacent 2-hop pairs of the synthetic link
    // graph — wedge join keyed by the shared neighbor, anti-join
    // against the edge set, broadcast degree joins.
    "q_link_pred" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val n = docs.agg(max("doc_id")).head().getLong(0) + 1
      val nodes = docs.select(col("doc_id").as("node"))
      GraphOps.linkPrediction(GraphOps.syntheticEdges(nodes, n), minCommon = 2)
        .orderBy("a", "b")
    }),
    // GDPR cascade-delete audit: the mod-97 custkeys as the deletion
    // request list, FK-cascaded through orders → lineitem and into
    // events; broadcast semi-join probes, one scan per table.
    "q_gdpr_cascade" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      RelationalOps.cascadeDeleteReport(cust, Tables.orders(s, dir),
          Tables.lineitem(s, dir), Tables.events(s, dir),
          cust.filter(col("c_custkey") % 97 === 0)
            .select(col("c_custkey").as("custkey")))
        .orderBy("table_name")
    }),
    // RFM customer segmentation: value-level equi-depth quintile
    // scores over recency/frequency/monetary — no per-row global
    // sort; every window runs on the distinct-value table.
    "q_rfm" -> ((s, dir) =>
      RelationalOps.rfmSegments(Tables.orders(s, dir)).orderBy("o_custkey")),
    // k-anonymity release (Samarati/Sweeney suppression ladder):
    // (nation, segment) groups of ≥ 5 customers release as-is;
    // undersized groups generalize segment → 'ANY', then collapse to
    // the fully-generalized bucket — every published row with a live
    // quasi-identifier covers ≥ 5 individuals.
    "q_kanon" -> ((s, dir) =>
      DataQualityOps.kAnonymize(Tables.customer(s, dir),
          col("c_nationkey"), col("c_mktsegment"), k = 5)
        .orderBy("level", "q1", "q2")),
    // Multi-source BFS over the synthetic link graph: min hops from
    // the mod-97 seed set within 4 rounds; frontier-only joins, the
    // oracle unrolls the same recursion.
    "q_bfs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val n = docs.agg(max("doc_id")).head().getLong(0) + 1 // dense ids
      val nodes = docs.select(col("doc_id").as("node"))
      GraphOps.bfsHops(GraphOps.syntheticEdges(nodes, n),
          nodes.filter(col("node") % 97 === 0), rounds = 4)
        .select(col("node").as("doc_id"), col("hop"))
        .orderBy("doc_id")
    }),
    // Community detection: 3 synchronous label-propagation rounds over
    // the same synthetic link graph (neighbor-majority vote, tie →
    // smallest label). One edges×labels join + two hash aggregates per
    // round; oracle unrolls the recursion.
    "q_lpa" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val n = docs.agg(max("doc_id")).head().getLong(0) + 1
      val nodes = docs.select(col("doc_id").as("node"))
      GraphOps.labelPropagation(GraphOps.syntheticEdges(nodes, n), rounds = 3)
        .select(col("node").as("doc_id"), col("label").as("community"))
        .orderBy("doc_id")
    }),
    // Dense-core extraction: 5 synchronous k-core peel rounds (k = 4)
    // over the same synthetic link graph (spam-farm / link-ring
    // detection). Fixpoint is round 3 at every gate SF — the extra
    // rounds are provable no-ops (GraphOpsSpec); oracle unrolls the
    // peeling round by round.
    "q_kcore" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val n = docs.agg(max("doc_id")).head().getLong(0) + 1
      val nodes = docs.select(col("doc_id").as("node"))
      GraphOps.kCore(GraphOps.syntheticEdges(nodes, n), k = 4, rounds = 5)
        .select(col("node").as("doc_id"), col("deg"))
        .orderBy("doc_id")
    }),
    // Incremental aggregation maintenance: per-customer (count, sum)
    // updated from the snapshot diff ONLY — group-moving updates
    // (mod-19 custkey bump) transfer mass between groups; the oracle
    // recomputes from scratch on the new snapshot, so equality proves
    // maintenance ≡ recomputation.
    "q_incr_agg" -> ((s, dir) => {
      val dec = "decimal(38,12)"
      val ord = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val prev = ord.filter(col("o_orderkey") % 11 =!= 0)
      val cur = ord.filter(col("o_orderkey") % 13 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + lit(1.0))
            .otherwise(col("o_totalprice")))
        .withColumn("o_custkey",
          when(col("o_orderkey") % 19 === 0, col("o_custkey") + lit(1L))
            .otherwise(col("o_custkey")))
      val oldAgg = prev.groupBy(col("o_custkey").as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).as("total"))
      val diff = RelationalOps.snapshotDiff(prev, cur, Seq("o_orderkey"))
      RelationalOps.applyCountSumDelta(oldAgg, diff,
          "o_custkey", "o_totalprice")
        .select(col("grp").as("o_custkey"), col("n"),
          round(col("total").cast("double"), 4).as("total"))
        .orderBy("o_custkey")
    }),
    // Pareto-frontier (skyline) curation filter: per-user engagement
    // stats (n_events, max value), keep users no other user dominates
    // on both axes. Engine runs the bucket-pruned exact plan; the
    // oracle is the O(n²) NOT EXISTS quantifier over the same stats —
    // equality proves the pruning dropped nothing.
    "q_skyline" -> ((s, dir) => {
      val stats = Tables.events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), max("value").as("max_value"))
      RelationalOps.skyline2D(stats, "n_events", "max_value",
          bucketWidth = 8)
        .orderBy("user_id")
    }),
    // Streaming hopping windows: the same 6h/3h windows as q_hop_window
    // through a real AvailableNow stream with watermarked state — the
    // overlapping-window member the streaming family was missing.
    // Gated by the SAME oracle as the batch form.
    "q_stream_hop" -> ((s, dir) => {
      val stream = Tables.eventsStream(s, dir)
      val agg = graft.streaming.StreamingOps.hoppingStats(stream, "ts",
        "value", "21600 seconds", "10800 seconds", "12 hours")
      val qn = s"graft_stream_hop_${StreamSeq.incrementAndGet()}"
      val q = agg.writeStream.format("memory").queryName(qn)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(qn)
        .select(unix_micros(col("w_start")).as("win_start_us"), col("n"),
          round(col("sum_value"), 4).as("sum_value"))
        .orderBy("win_start_us")
    }),
    // Streaming windowed top-k: per-6h-window event-type counts
    // through a real AvailableNow stream (bounded per-window category
    // state), top-3 ranked after the sink — the trending-feed shape.
    "q_stream_topk" -> ((s, dir) => {
      val stream = Tables.eventsStream(s, dir)
      val agg = graft.streaming.StreamingOps.windowedTypeCounts(stream,
        "ts", "event_type", "21600 seconds", "12 hours")
      val qn = s"graft_stream_topk_${StreamSeq.incrementAndGet()}"
      val q = agg.writeStream.format("memory").queryName(qn)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val w = Window.partitionBy("w_start")
        .orderBy(col("n").desc, col("event_type").asc)
      s.table(qn)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(unix_micros(col("w_start")).as("win_start_us"),
          col("event_type"), col("n"), col("rk"))
        .orderBy("win_start_us", "rk")
    }),
    // Last-touch conversion attribution: every purchase credited to
    // the user's most recent click/view/signup within 24 h (organic →
    // NULL). One user-keyed window pass; (ts, event_id) total order.
    "q_attribution" -> ((s, dir) =>
      TemporalOps.lastTouchAttribution(Tables.events(s, dir),
          convType = "purchase", touchTypes = Seq("click", "view", "signup"),
          lookbackUs = 24L * 3600 * 1000000)
        .orderBy("user_id", "conv_event_id")),
    // Event-sequence transition matrix: P(next type | type) per user
    // timeline — one user-keyed window exchange, then type²-sized aggs.
    "q_transitions" -> ((s, dir) =>
      TemporalOps.transitionMatrix(Tables.events(s, dir), Seq("user_id"),
          "ts", "event_type", "event_id")
        .orderBy("from_type", "to_type")),
    // Distributed K-means (Lloyd's): full-corpus assignment passes with
    // k×dims driver state only; decimal-exact centroid updates make
    // every iteration's literals bit-identical in any engine, so the
    // oracle replays 2 full iterations as chained CTEs and gates every
    // row's final cluster + distance.
    "q_kmeans" -> ((s, dir) =>
      ClusterOps.kmeans(Tables.embeddings(s, dir), "vec_id", "embedding",
          dims = 8, k = 4, iters = 2)
        .orderBy("vec_id")),
    // Diversity/coreset sampling: k-center greedy farthest-point
    // selection on the integer-quantized grid — every distance² an
    // exact integer, selection trajectory + cover-radius certificate
    // gated row-for-row.
    "q_kcenter" -> ((s, dir) =>
      ClusterOps.kCenterGreedy(Tables.embeddings(s, dir), k = 8)
        .orderBy("sel_rank")),
    // Grid-density clustering (DBSCAN-lite): eps-grid on the first two
    // embedding dims, dense cells (≥ 8 pts) unioned over 8-adjacency
    // into clusters, sparse points → NULL noise. All graph work on the
    // CELL table; oracle closes the adjacency with a recursive CTE.
    "q_grid_density" -> ((s, dir) =>
      ClusterOps.gridDensityClusters(Tables.embeddings(s, dir),
          eps = 0.05, minPts = 8)
        .orderBy("vec_id")),
    // Bucketed-table co-located join: lineitem and orders rewritten as
    // 8-bucket tables hashed on the order key, then joined through the
    // catalog — the ingest-time layout that removes BOTH join-side
    // exchanges for every downstream join on the key (BucketingSpec
    // pins the zero-exchange plan). Gate covers writer → catalog →
    // bucket-aware scan → join → agg end to end.
    "q_bucketed_join" -> ((s, dir) => {
      val tag = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val base = s"/tmp/graft_bucketed_$tag"
      val l = graft.sources.Bucketing.writeBucketed(
        Tables.lineitem(s, dir)
          .select("l_orderkey", "l_extendedprice", "l_discount"),
        s"graft_bl_$tag", s"$base/lineitem", "l_orderkey", 8)
      val o = graft.sources.Bucketing.writeBucketed(
        Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
        s"graft_bo_$tag", s"$base/orders", "o_orderkey", 8)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(28,12)")).cast("double"), 4).as("revenue"))
        .orderBy("o_orderpriority")
    }),
    // BPE tokenizer-training primitive: corpus-wide adjacent-char-pair
    // counts (the quantity each merge iteration maximizes), aggregated
    // over DISTINCT words first so the explode touches vocabulary, not
    // occurrences. Top-50, ties on the pair.
    "q_bpe_pairs" -> ((s, dir) =>
      TextOps.bpePairCounts(Tables.documents(s, dir), 50)),
    // Full BPE trainer: 8 merge rounds over the word-frequency table
    // (pick most-frequent adjacent symbol pair, merge every occurrence,
    // re-pair), then the final top-20 symbol vocabulary. Each round's
    // pick depends on all prior merges; the vocab section pins that
    // merges were applied, not just selected.
    "q_bpe_merges" -> ((s, dir) =>
      TextOps.bpeMerges(Tables.documents(s, dir), rounds = 8, vocabTopK = 20)),
    // Tokenizer application: merges fit on the train split (doc_id%5!=0)
    // encode the held-out eval split; per-doc token fan-out stats.
    "q_bpe_encode" -> ((s, dir) =>
      TextOps.bpeEncode(Tables.documents(s, dir), rounds = 8, evalMod = 5)),
    // Exact-substring duplication: 32-char windows at stride 16 —
    // verbatim cross-doc text (boilerplate, licenses) that token-level
    // similarity smooths over. Inverted-index shape, exact integers.
    "q_substring_dups" -> ((s, dir) =>
      DedupOps.sharedSubstringStats(Tables.documents(s, dir))
        .select(col("doc_id"), col("n_windows"), col("n_shared"),
          round(col("shared_frac"), 6).as("shared_frac"))
        .orderBy("doc_id")),
    // Corpus-statistics quality: fraction of each doc's distinct
    // bigrams that are corpus-rare (df ≤ 2) — the count-based
    // perplexity-filter analogue; exact integer semantics so the
    // oracle gates it fully (keep flag decided on the unrounded ratio).
    "q_rare_bigrams" -> ((s, dir) =>
      TextAnalysisOps.rareBigramStats(Tables.documents(s, dir))
        .select(col("doc_id"), col("n_bigrams"), col("n_rare"),
          round(col("rare_frac"), 6).as("rare_frac"), col("keep"))
        .orderBy("doc_id")),
    // Collocation mining: top-50 adjacent token pairs by lift over the
    // shared tokenizer, published as integer ppm — all-count
    // arithmetic, so ranking AND values gate exactly (no float ratio).
    "q_colloc" -> ((s, dir) =>
      TextOps.collocations(Tables.documents(s, dir), minCount = 5, k = 50)),
    // CCNet-style perplexity filter core: add-one-smoothed bigram LM
    // trained ON the corpus, each doc scored by average bigram NLL. Terms
    // rounded at 9 dp (libm rule), decimal-summed, published at 6 dp;
    // keep decided on the published value so the flag is engine-exact.
    "q_lm_nll" -> ((s, dir) =>
      TextOps.bigramNll(Tables.documents(s, dir), keepBelow = LmKeepBelow)
        .orderBy("doc_id")),
    // Curation-classifier shape (fastText/CCNet): multinomial Naive
    // Bayes language classifier trained on the mod-5 train split,
    // classifying the held-out split. Count tables are vocab×class-
    // keyed; 9-dp ln terms + decimal sums make score AND argmax
    // engine-exact (ties break to the smaller class label).
    "q_naive_bayes" -> ((s, dir) =>
      TextOps.naiveBayes(Tables.documents(s, dir), labelCol = "lang", evalMod = 5)
        .orderBy("doc_id")),
    // Feature selection for the curation classifiers: mutual
    // information between doc-level token presence and the language
    // label (IR §13.5.1). All-count probability ratios, 9-dp ln
    // terms, decimal sums — ranking and values engine-exact; top-30
    // rides TakeOrderedAndProject.
    "q_mi_tokens" -> ((s, dir) =>
      TextOps.tokenLabelMi(Tables.documents(s, dir), labelCol = "lang", k = 30)),
    // GloVe/word2vec prep: windowed co-occurrence counts (offsets
    // 1..3, map-only zip_with pair generation — no positional
    // self-join) scored by PPMI against the pair-table marginals.
    "q_cooccur" -> ((s, dir) =>
      TextOps.windowedCooccur(Tables.documents(s, dir), window = 3, minCount = 5)),
    // Keyword salience: TextRank — damped weighted PageRank over the
    // same co-occurrence graph (5 rounds, 9-dp fixpoint path).
    "q_textrank" -> ((s, dir) =>
      TextOps.textRank(Tables.documents(s, dir), window = 3, minCount = 5,
          damping = 0.85, rounds = 5)
        .orderBy("word")),
    // Link-graph centrality (web-crawl quality prior): PageRank with
    // damping 0.85 over a deterministic synthetic crawl graph (dense
    // doc ids, fixed out-degree 3, skewed in-degrees). Scaled-INTEGER
    // rank keeps every loop iteration BIGINT-exact — rank_scaled gates
    // the whole 5-round scatter/gather bit-for-bit; the double `rank`
    // is one final exact-int division.
    "q_pagerank" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val n = docs.agg(max("doc_id")).head().getLong(0) + 1 // dense ids
      val nodes = docs.select(col("doc_id").as("node"))
      GraphOps.pageRank(nodes, GraphOps.syntheticEdges(nodes, n),
          outDeg = 3, iters = 5, nNodes = n)
        .select(col("node").as("doc_id"), col("rank_scaled"), col("rank"))
        .orderBy("doc_id")
    }),
    // Personalized PageRank from a 10-doc seed set (doc_id < 10) —
    // the seed-biased relevance walk behind related-docs and
    // crawl-frontier ranking. Same scaled-BIGINT trick as q_pagerank:
    // teleport mass goes only to seeds, so the whole 5-round walk
    // gates bit-for-bit; `rank` is one final exact-int division by
    // |S|·60⁵. Edge list shuffles once; rounds move the node table.
    "q_ppr" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val n = docs.agg(max("doc_id")).head().getLong(0) + 1 // dense ids
      val nodes = docs.select(col("doc_id").as("node"),
        (col("doc_id") < 10).as("seed"))
      GraphOps.personalizedPageRank(nodes,
          GraphOps.syntheticEdges(nodes, n), outDeg = 3, iters = 5,
          nSeeds = 10)
        .select(col("node").as("doc_id"), col("rank_scaled"), col("rank"))
        .orderBy("doc_id")
    }),
    // Embedding conditioning: per-dimension z-score normalization
    // (stats over ALL 64 dims — one partial-aggregated dims-row
    // exchange — published slice bounded to dims < 8). z derives from
    // the PUBLISHED rounded mean/std, so every engine agrees exactly.
    "q_embed_zscore" -> ((s, dir) =>
      SimilarityOps.dimensionZScore(Tables.embeddings(s, dir), outDims = 8)
        .orderBy("vec_id", "dim")),
    // JL Rademacher projection 64→16 + distortion certificate over
    // adjacent pairs: md5-derived ±1 signs, decimal-summed projections
    // (exact 0.25 scale), ratio ‖Δp‖²/‖Δx‖² bound-checked on BOTH
    // sides (the oracle recomputes the check, so the gate hashes the
    // claim itself). Measured range at sf0.1: [0.23, 2.34].
    "q_jl_project" -> ((s, dir) =>
      SimilarityOps.jlDistortionPairs(Tables.embeddings(s, dir),
          inDims = 64, outDims = 16, lo = 0.15, hi = 3.0)
        .orderBy("va")),
    // Rolling z-score anomaly detection: each event scored against the
    // mean/std of its 6 predecessors (frame excludes self; cold-start
    // and zero-variance rows null out). One exchange + one WindowExec.
    "q_ts_anomaly" -> ((s, dir) =>
      TemporalOps.rollingAnomaly(
          Tables.events(s, dir).filter(col("user_id") < 30),
          Seq("user_id"), "ts", "value", "event_id")
        .select(col("user_id"), col("event_id"), col("seq"), col("value"),
          col("n_prior"), col("base_mean"), col("base_std"), col("z"),
          col("is_anomaly"))
        .orderBy("user_id", "seq")),
    // Semi-structured extraction: the events.props JSON column parsed
    // with a real JSON reader (from_json + schema) and aggregated on
    // the extracted field — the metadata-filtering shape every curation
    // pipeline needs (provenance tags, crawl headers). Map-only parse,
    // one partial-aggregated exchange on the (tiny) type key.
    "q_json_props" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          from_json(col("props"), "k BIGINT", Map.empty[String, String])
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"),
          count_distinct(col("k")).as("n_distinct_k"))
        .orderBy("event_type")),
    // Ordered funnel (view → click-after-view → purchase-after-click):
    // per-user first-resolution timestamps, strict step order, stage =
    // resolved prefix length. Exact epoch-micros outputs.
    "q_funnel" -> ((s, dir) =>
      TemporalOps.funnel(Tables.events(s, dir), Seq("user_id"), "ts",
          "event_type", Seq("view", "click", "purchase"))
        .orderBy("user_id")),
    // Cohort retention: 7-day epoch-anchored cohorts of first activity,
    // per-offset distinct-user comeback counts. Integer-exact period
    // arithmetic on both engines; offset 0 = cohort_size self-check.
    "q_cohort_retention" -> ((s, dir) =>
      TemporalOps.cohortRetention(Tables.events(s, dir), "user_id", "ts", 7)
        .orderBy("cohort", "offset")),
    // Sketch tier, distinct counts: HLL++ next to the exact distinct,
    // certificate = relative error within 3x the requested rsd. Oracle
    // emits literal TRUE -> hash equality proves the bound.
    "q_approx_distinct" -> ((s, dir) =>
      SketchOps.distinctCountCertificate(Tables.events(s, dir),
          Seq("event_type"), "user_id", rsd = 0.05, errBound = 0.15)
        .orderBy("event_type")),
    // Sketch tier, quantiles: percentile_approx rank-error certificate
    // (returned element's rank interval must hit q*n +/- n/accuracy).
    "q_approx_quantile" -> ((s, dir) =>
      SketchOps.quantileCertificate(Tables.events(s, dir),
          Seq("event_type"), "value", Seq(0.5, 0.9, 0.99), accuracy = 1000)
        .orderBy("event_type", "q_idx")),
    // Record linkage: PASS-JOIN segment-blocked edit-distance pairs on
    // a 16-char prefix key, dist <= 3. Oracle is UNBLOCKED all-pairs
    // Levenshtein -- equality proves the pigeonhole blocking misses
    // nothing.
    "q_editdist_pairs" -> ((s, dir) =>
      DedupOps.editDistancePairs(Tables.documents(s, dir), maxDist = 3,
          keyLen = 16)
        .orderBy("id_a", "id_b")),
    // Arbitrary GROUPING SETS (dimension marginals -- not a rollup/cube
    // prefix chain): per-type, per-user-bucket, and grand-total rows in
    // one pass; aggregated-out dims coalesce to sentinels.
    "q_grouping_sets" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("ub", pmod(col("user_id"), lit(4L)))
      ev.groupingSets(
          Seq(Seq(col("event_type")), Seq(col("ub")), Seq.empty),
          col("event_type"), col("ub"))
        .agg(count(lit(1)).as("n"), decMean(col("value")).as("mean_value"))
        .select(coalesce(col("event_type"), lit("ALL")).as("dim_type"),
          coalesce(col("ub"), lit(-1L)).as("dim_bucket"),
          col("n"), col("mean_value"))
        .orderBy("dim_type", "dim_bucket")
    }),
    // Winsorized per-group stats: exact p05/p95 clip, raw vs clipped
    // decimal-summed means, clip counts. The exact-percentile tier for
    // bounded group cardinality (the sketch tier covers the rest).
    "q_winsorize" -> ((s, dir) =>
      RelationalOps.winsorizedStats(Tables.events(s, dir), "event_type",
          "value", lo = 0.05, hi = 0.95, mean = decMean)
        .orderBy("event_type")),
    // Robust per-row outlier score (modified z, median/MAD, 3.5 rule);
    // flag derives from the published rounded score.
    "q_robust_z" -> ((s, dir) =>
      RelationalOps.robustZScores(Tables.events(s, dir), "event_type",
          "value")
        .select(col("event_id"), col("event_type"), col("z"),
          col("is_outlier"))
        .orderBy("event_id")),
    // Top principal component by 5-round power iteration; every
    // cross-row sum is decimal-protected, round(,6) absorbs the
    // engines' decimal-cast tie divergence (PageRank's unrolled-
    // recurrence oracle pattern, applied to a covariance matvec).
    "q_pca_top" -> ((s, dir) =>
      SimilarityOps.powerIterationPC(Tables.embeddings(s, dir))
        .orderBy("dim")),
    // Leakage-free 80/10/10 split by user: per-split sizes plus a
    // computed (not literal) group-integrity certificate.
    "q_group_split" -> ((s, dir) => {
      val sp = RelationalOps.groupSplit(Tables.events(s, dir), "user_id",
        Seq(0.8, 0.1, 0.1), "split5")
      val leak = sp.groupBy("user_id")
        .agg(count_distinct(col("split")).as("ns"))
        .agg(max(col("ns")).as("mx"))
      sp.groupBy("split")
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("user_id")).as("n_users"))
        .crossJoin(broadcast(leak))
        .select(col("split"), col("n_rows"), col("n_users"),
          (col("mx") === 1L).as("leak_free"))
        .orderBy("split")
    }),
    // Per-doc unigram entropy — the information-theoretic quality
    // feature (low = dominated by one token). One (doc,word) aggregate,
    // then one doc-keyed exchange shared by the total window and the
    // final aggregate. Normalized form derives from the published value.
    "q_token_entropy" -> ((s, dir) =>
      TextAnalysisOps.tokenEntropy(Tables.documents(s, dir))
        .orderBy("doc_id")),
    // Z-order (Morton) layout: interleave (user_id, event_id%2^16) and
    // bucket by the high z-bits — the gate proves every bucket covers a
    // bounded RECTANGLE in both dims (min/max per bucket), i.e. the
    // locality property that makes lakehouse ZORDER prune scans.
    "q_zorder" -> ((s, dir) => {
      val pts = Tables.events(s, dir).select(col("event_id"), col("user_id"),
        pmod(col("event_id"), lit(65536L)).as("e16"))
      pts.withColumn("z",
          graft.PlanUtils.zValue(col("user_id"), col("e16"), 16))
        .groupBy(shiftright(col("z"), 16).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min("user_id").as("u_min"), max("user_id").as("u_max"),
          min("e16").as("e_min"), max("e16").as("e_max"))
        .orderBy("bucket")
    }),
    // Trigram LM with stupid backoff (Brants et al. 2007) on a held-out
    // split: train on doc_id%5!=0, score doc_id%5==0 — unseen eval
    // trigrams genuinely walk the backoff chain (per-branch counts are
    // part of the gate). The distributed-LM scoring shape: vocab-keyed
    // count tables + four shuffle joins.
    "q_lm_backoff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextOps.trigramBackoffNll(
        docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(5L)) === 0))
        .orderBy("doc_id")
    }),
    // Streaming mirror of q_ts_anomaly through flatMapGroupsWithState
    // (ring-buffer state, ≤ 6 doubles + a counter per key) — gated by
    // THE SAME oracle as the batch window form: streaming/batch parity.
    // Streaming last-touch attribution: the q_attribution semantics
    // through a real AvailableNow stream — per-user state is ONE
    // touch struct; gated by the SAME oracle as the batch form
    // (streaming/batch parity is the tested property).
    "q_stream_attribution" -> ((s, dir) => {
      import s.implicits._
      val stream = Tables.eventsStream(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("event_type"))
        .as[(Long, Long, Long, String)]
      val attributed = graft.streaming.StreamingOps.attributionByKey(
        stream, "purchase", Set("click", "view", "signup"),
        24L * 3600 * 1000000)
      val qn = s"graft_stream_attr_${StreamSeq.incrementAndGet()}"
      val q = attributed.toDF().writeStream.format("memory").queryName(qn)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(qn)
        .select("user_id", "conv_event_id", "conv_ts_us", "touch_type",
          "touch_event_id", "mins_since_touch")
        .orderBy("user_id", "conv_event_id")
    }),
    "q_stream_anomaly" -> ((s, dir) => {
      import s.implicits._
      val stream = Tables.eventsStream(s, dir)
        .filter(col("user_id") < 30)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("value"))
        .as[(Long, Long, Long, Double)]
      val scored = graft.streaming.StreamingOps.rollingAnomalyByKey(stream)
      val qn = s"graft_stream_anomaly_${StreamSeq.incrementAndGet()}"
      val q = scored.toDF().writeStream.format("memory").queryName(qn)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(qn)
        .select("user_id", "event_id", "seq", "value", "n_prior",
          "base_mean", "base_std", "z", "is_anomaly")
        .orderBy("user_id", "seq")
    }),
    // Data mixing: per-domain sampling weights against a fixed target
    // mixture (the skewed-by-construction mixTargets map), then the
    // deterministic hash-thresholded resample that realizes it. The
    // oracle recomputes the same weights/copy counts from the same
    // integer formulas, so the gate proves the whole chain — mass agg,
    // window total, weight arithmetic, per-doc copy realization.
    "q_mixture_weights" -> ((s, dir) =>
      MixtureOps.mixtureWeights(Tables.documents(s, dir), mixTargets)
        .select(col("domain"), col("n_docs"), col("mass"),
          round(col("actual_frac"), 6).as("actual_frac"),
          round(col("target_frac"), 6).as("target_frac"),
          round(col("weight"), 6).as("weight"))
        .orderBy("domain")),
    "q_mixture_resample" -> ((s, dir) =>
      MixtureOps.mixtureResample(Tables.documents(s, dir), mixTargets)
        .orderBy("doc_id", "copy_no")),
    // Decontamination again, through the Bloom-prefilter scale shape
    // (eval side modeled as too big to broadcast: one distributed bloom
    // build, map-side prefilter, shuffled confirm join). Different
    // slice (mod-5) and threshold than q_decontaminate so the two gates
    // are independent; EXACT output — bloom has no false negatives and
    // the confirm join removes the false positives — so the same
    // oracle construction applies unchanged.
    "q_bloom_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      DedupOps.bloomContaminatedPairs(
        docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(5L)) === 0), minFrac = 0.25)
        .select(col("train_id"), col("eval_id"), round(col("frac"), 6).as("frac"))
        .orderBy("train_id", "eval_id")
    }),
    // The stop-shingle-capped variant (evalDfCap — SCALE.md's fix for
    // the one superlinear decade reading): shingles in more than ONE
    // eval doc stop certifying; frac counts only informative shingles
    // over the FULL train size, a conservative lower bound. The cap is
    // SQL-expressible, so this path gets its own oracle (an eval-df
    // CTE + join filter) — the scale mitigation is driver-gated, not
    // just spec-gated. cap=1 + minFrac=0.1 VISIBLY bites at sf0.01
    // (2 pairs dropped, 15 fracs lowered vs uncapped), so the gate
    // certifies the cap arithmetic, not a no-op.
    "q_decontam_capped" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      DedupOps.bloomContaminatedPairs(
        docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(5L)) === 0), minFrac = 0.1,
        evalDfCap = 1L)
        .select(col("train_id"), col("eval_id"), round(col("frac"), 6).as("frac"))
        .orderBy("train_id", "eval_id")
    }),
    // §2.1 S2/S3 driver-gated: documents metadata round-tripped through
    // the CSV and JSON-lines sources (write to scratch, read back with
    // an explicit schema — the reference's file-shaped inputs). The
    // oracle reads the parquet table directly, so a lossy or misparsed
    // round trip hash-mismatches.
    "q_csv_roundtrip" -> ((s, dir) => {
      val path = s"/tmp/graft_src_${new java.io.File(dir).getName}/docs_csv"
      val meta = Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars")
      meta.write.mode("overwrite").option("header", "true").csv(path)
      s.read.schema(meta.schema).option("header", "true").csv(path)
        .orderBy("doc_id")
    }),
    "q_json_roundtrip" -> ((s, dir) => {
      val path = s"/tmp/graft_src_${new java.io.File(dir).getName}/docs_json"
      val meta = Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars")
      meta.write.mode("overwrite").json(path)
      s.read.schema(meta.schema).json(path)
        .orderBy("doc_id")
    }),
    // The reference's ACTUAL input format is gzip-compressed JSON-lines
    // (`Assignment 3/a3_p1.py:12` reads hdfs:/data/Software_5.json.gz).
    // Same round trips through the codec path — the writes produce .gz
    // part files, the reads decompress via the file-extension codec
    // resolution any Hadoop-compatible path uses — against the same
    // parquet-truth oracle, so a codec or parse fault hash-mismatches.
    "q_csv_gz" -> ((s, dir) => {
      val path = s"/tmp/graft_src_${new java.io.File(dir).getName}/docs_csv_gz"
      val meta = Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars")
      meta.write.mode("overwrite").option("header", "true")
        .option("compression", "gzip").csv(path)
      s.read.schema(meta.schema).option("header", "true").csv(path)
        .orderBy("doc_id")
    }),
    "q_json_gz" -> ((s, dir) => {
      val path = s"/tmp/graft_src_${new java.io.File(dir).getName}/docs_json_gz"
      val meta = Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars")
      meta.write.mode("overwrite").option("compression", "gzip").json(path)
      s.read.schema(meta.schema).json(path)
        .orderBy("doc_id")
    }),
    // ORC — the second columnar format bundled with Spark (typed,
    // striped, predicate-pushdown-capable like parquet); a 100 TB lake
    // is rarely single-format, so the engine gates both.
    "q_orc_roundtrip" -> ((s, dir) => {
      val path = s"/tmp/graft_src_${new java.io.File(dir).getName}/docs_orc"
      val meta = Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars")
      meta.write.mode("overwrite").orc(path)
      s.read.schema(meta.schema).orc(path)
        .orderBy("doc_id")
    }),
    // Parquet re-write under zstd — the compression codec current
    // training-data pipelines standardize on (better ratio than snappy
    // at comparable read speed); gates the codec path end to end.
    "q_parquet_zstd" -> ((s, dir) => {
      val path = s"/tmp/graft_src_${new java.io.File(dir).getName}/docs_pq_zstd"
      val meta = Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars")
      meta.write.mode("overwrite").option("compression", "zstd").parquet(path)
      s.read.parquet(path)
        .orderBy("doc_id")
    }),
    // Schema evolution across parquet batches — the data-lake reality
    // that ingest batches gain columns over time. Even doc ids land in
    // an old-schema batch (doc_id, lang), odd ids in the widened one
    // (+ source, n_chars); `mergeSchema` reconciles on read and the
    // old batch's missing columns surface as nulls (coalesced to
    // sentinels so the oracle's CASE mirrors them exactly).
    "q_schema_evolution" -> ((s, dir) => {
      val path = s"/tmp/graft_src_${new java.io.File(dir).getName}/docs_evo"
      val meta = Tables.documents(s, dir)
      meta.filter(pmod(col("doc_id"), lit(2L)) === 0)
        .select("doc_id", "lang")
        .write.mode("overwrite").parquet(s"$path/v1")
      meta.filter(pmod(col("doc_id"), lit(2L)) === 1)
        .select("doc_id", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$path/v2")
      s.read.option("mergeSchema", "true").parquet(s"$path/v1", s"$path/v2")
        .select(col("doc_id"), col("lang"),
          coalesce(col("source"), lit("_absent")).as("source"),
          coalesce(col("n_chars"), lit(-1L)).as("n_chars"))
        .orderBy("doc_id")
    }),
    // Relational completeness: FULL OUTER reconciliation — custkeys
    // with orders vs high-balance customers; genuine nulls on BOTH
    // sides (ordering customers below the balance bar, rich customers
    // who never ordered), collapsed to sentinels so the gate is
    // null-representation-proof across engines.
    "q_full_outer" -> ((s, dir) => {
      val withOrders = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_orders"))
      val rich = Tables.customer(s, dir).filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("custkey"), col("c_acctbal"))
      withOrders.join(rich, Seq("custkey"), "full_outer")
        .select(col("custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          round(coalesce(col("c_acctbal"), lit(-1.0)), 2).as("acctbal"))
        .orderBy("custkey")
    }),
    // Relational completeness: PIVOT — per-source doc counts spread
    // across the five language columns (explicit value list, so the
    // plan is ONE aggregate pass — no per-language scans).
    "q_pivot" -> ((s, dir) =>
      Tables.documents(s, dir).groupBy("source")
        .pivot("lang", Seq("de", "en", "es", "fr", "zh")).count()
        .select(col("source") +: Seq("de", "en", "es", "fr", "zh")
          .map(l => coalesce(col(l), lit(0L)).as(l)): _*)
        .orderBy("source")),
    // §2.7 set ops beyond EXCEPT: INTERSECT (custkeys with orders AND
    // high balance).
    "q_intersect" -> ((s, dir) =>
      Tables.orders(s, dir).select(col("o_custkey").as("custkey"))
        .intersect(Tables.customer(s, dir).filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("custkey")))
        .orderBy("custkey")),
    // Beyond the reference: the TPC-H Q5 shape — a 6-way star join
    // (region→nation→supplier ⋈ customer→orders→lineitem with the
    // local-supplier correlation) declared relationally and left to
    // Catalyst: the dim chain broadcasts, filters push into the scans,
    // and the fact side shuffles only on its join keys. Exercises the
    // four otherwise-dim-only tables (region/nation/supplier/part are
    // the star schema's lookup side at 100 TB).
    "q_star_join" -> ((s, dir) => {
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val su = Tables.supplier(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey")
          && c("c_nationkey") === su("s_nationkey"))
        .join(n, su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(n("n_name").as("n_name"))
        .agg(round(sum((l("l_extendedprice") * (lit(1) - l("l_discount")))
          .cast("decimal(28,12)")).cast("double"), 4).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),
    // Beyond the reference: hierarchical aggregation (ROLLUP) — the
    // partial-agg tree Catalyst plans for grouping sets.
    "q_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(28,12)")).cast("double").as("sum_qty"))
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          round(col("sum_qty"), 4).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),
    // Beyond the reference: CUBE — all grouping-set combinations from
    // one expand + one exchange (completes the grouping-set family
    // next to q_rollup).
    "q_cube" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(28,12)")).cast("double").as("sum_qty"))
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          round(col("sum_qty"), 4).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),
    // Beyond the reference: exact percentiles (sort-based, interpolated
    // — matches DuckDB quantile_cont bit-for-bit after rounding).
    "q_percentiles" -> ((s, dir) =>
      Tables.events(s, dir).groupBy("event_type")
        .agg(expr("percentile(value, array(0.5D, 0.9D))").as("q"))
        .select(col("event_type"), round(col("q")(0), 4).as("med_value"),
          round(col("q")(1), 4).as("p90_value"))
        .orderBy("event_type")),
    // Beyond the reference: AS-OF join — point-in-time-correct lookup
    // of each purchase's latest preceding view per user. Sort-based
    // rewrite (one keyed exchange, no inequality-join pair explosion);
    // oracle = DuckDB's native ASOF LEFT JOIN.
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id", "value")
      // deterministic representative per (user, ts) — the asOfJoin tie
      // contract; max_by/arg_max match across engines
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts")
        .agg(max_by(col("value"), col("event_id")).as("v_value"),
          max(col("event_id")).as("v_event"))
      TemporalOps.asOfJoin(purchases, views, Seq("user_id"), "ts",
        Seq("v_event", "v_value"))
        .select(col("user_id"), col("event_id").as("p_event"),
          unix_micros(col("ts")).as("p_ts_us"),
          col("asof_v_event").as("v_event"),
          round(col("asof_v_value"), 4).as("v_value"))
        .orderBy("user_id", "p_event")
    }),
    // Beyond the reference: sessionization — 30-minute-gap session
    // windows per user (merging session agg; streaming-capable).
    "q_sessionize" -> ((s, dir) =>
      TemporalOps.sessionize(Tables.events(s, dir), Seq("user_id"), "ts", "30 minutes")
        .select(col("user_id"), unix_micros(col("s_start")).as("start_us"),
          unix_micros(col("s_end")).as("end_us"), col("n_events"))
        .orderBy("user_id", "start_us")),
    // The SAME sessionization run as a REAL stream: AvailableNow over
    // the parquet source with a watermark, merging session_window state
    // across micro-batches, memory sink — hash-matched against the
    // same DuckDB oracle as the batch q_sessionize, so the streaming
    // session path is part of the correctness gate end to end (the
    // unit parity test in TemporalOpsSpec covers multi-batch merging).
    "q_stream_sessionize" -> ((s, dir) => {
      val stream = Tables.eventsStream(s, dir)
      val sessions = TemporalOps.sessionize(
        stream.withWatermark("ts", "24 hours"), Seq("user_id"), "ts", "30 minutes")
      val qn = s"graft_stream_sessionize_${StreamSeq.incrementAndGet()}"
      val q = sessions.writeStream.format("memory").queryName(qn)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(qn)
        .select(col("user_id"), unix_micros(col("s_start")).as("start_us"),
          unix_micros(col("s_end")).as("end_us"), col("n_events"))
        .orderBy("user_id", "start_us")
    }),
    // Beyond the reference: range (interval-containment) join — events
    // against 20 OVERLAPPING 48h maintenance windows on a 36h stride,
    // via the bucketized equi-join rewrite (no nested-loop product).
    // Aggregated per window so the oracle output stays small.
    "q_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("ts", "value")
      TemporalOps.rangeJoinPoints(ev, "ts", maintenanceWindows(s), "w_start", "w_end",
        48 * HourUs)
        .groupBy("w_id")
        .agg(count(lit(1)).as("n"), decMean(col("value")).as("mean_value"))
        .orderBy("w_id")
    }),
    // The SAME range join written the NAIVE way — `ts BETWEEN w_start
    // AND w_end` as a raw inequality inner join, which Spark alone
    // plans as BroadcastNestedLoopJoin — with the RewriteRangeJoin
    // optimizer rule enabled: the rule rewrites it to the bucketized
    // equi-join automatically (plan gated in PlanShapeSpec: no nested
    // loop survives). Hash-matches q_range_join's oracle, so the
    // rule's semantics-preservation claim is re-proven by the driver
    // gate every round, not just in unit tests.
    "q_range_join_rule" -> ((s, dir) => {
      graft.plans.RewriteRangeJoin.ensure(s)
      // the conf must outlive this builder (optimization runs lazily at
      // action time), so it stays set on the session; the rule only
      // matches inner joins whose condition is exactly a timestamp
      // band, so no other registered query's plan can change
      s.conf.set("spark.graft.rangeJoin.bucketWidthUs", (48 * HourUs).toString)
      val ev = Tables.events(s, dir).select("ts", "value")
      ev.join(maintenanceWindows(s),
          col("ts") >= col("w_start") && col("ts") <= col("w_end"))
        .groupBy("w_id")
        .agg(count(lit(1)).as("n"), decMean(col("value")).as("mean_value"))
        .orderBy("w_id")
    }),
    // Beyond the reference: ordered analytic window — per-user running
    // event count and running value sum by event time.
    "q_window_running" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir).filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          row_number().over(w).as("event_seq"),
          round(sum(col("value").cast("decimal(28,12)")).over(w).cast("double"), 4)
            .as("running_value"))
        .orderBy("user_id", "event_seq")
    }),
    // Skew-safe join: events keyed by event_type (5 distinct values —
    // key cardinality far below cluster parallelism, so an unsalted
    // shuffle join runs on ≤ 5 reducers no matter the cluster size;
    // AQE can split a skewed partition but never a single hot KEY).
    // PlanUtils.saltedJoin splits every key across 8 salted reducers;
    // the shuffle_hash hint keeps the tiny dim from broadcasting so
    // the gated plan exercises the salted SHUFFLE path it exists for.
    // The oracle is the plain unsalted join — hash equality proves
    // row-identity every round (also plan-gated in PlanUtilsSpec).
    "q_salted_join" -> ((s, dir) => {
      import s.implicits._
      val dim = Seq(("click", 1.0), ("error", 0.25), ("purchase", 10.0),
        ("signup", 5.0), ("view", 0.5)).toDF("event_type", "weight")
      val ev = Tables.events(s, dir).select("event_type", "value").hint("shuffle_hash")
      PlanUtils.saltedJoin(ev, dim, "event_type", col("value"), 8)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(sum((col("value") * col("weight")).cast("decimal(28,12)"))
            .cast("double"), 4).as("weighted_value"))
        .orderBy("event_type")
    }),
    // Multimodal: metadata-only resize plan over binary media rows.
    "q_mm_resize" -> ((s, dir) =>
      MultimodalOps.resizePlan(MultimodalOps.asMedia(Tables.documents(s, dir)), 128)
        .orderBy("media_id")),
    // Multimodal: every-7th-frame sampling for video rows — a
    // METADATA-ONLY plan by design (the scale posture: a video pipeline
    // samples frame indices first and decodes only those; the real
    // decode counterpart is q_mm_video_real).
    "q_mm_frames" -> ((s, dir) =>
      MultimodalOps.sampleFrames(MultimodalOps.asMedia(Tables.documents(s, dir)), 7)
        .orderBy("media_id", "frame_no")),
    // Multimodal STUB tier (named as such): batched binary decode with
    // the deterministic md5 placeholder kernel through real
    // Dataset.mapPartitions plumbing, exploded per dim. Gates the BATCH
    // SHAPE a drop-in production decoder inherits; the real-codec gates
    // (q_mm_decode_real / q_mm_jpeg / q_mm_audio_real / q_mm_video_real)
    // gate actual codecs.
    "q_mm_decode_stub" -> ((s, dir) =>
      MultimodalOps.decodeFeatures(MultimodalOps.asMedia(Tables.documents(s, dir)), 8)
        .toDF()
        .select(col("media_id"), col("n_bytes"), posexplode(col("features")))
        .select(col("media_id"), col("n_bytes"), col("pos").as("d"),
          round(col("col").cast("double"), 6).as("f"))
        .orderBy("media_id", "d")),
    // Multimodal: the REAL codec path — deterministic pixel patterns
    // rendered and encoded to genuine PNG bytes, decoded back through
    // javax.imageio, reduced to exact per-channel pixel sums. The
    // oracle recomputes the sums from the pixel formula with no codec
    // anywhere, so a green row proves the engine's encode→decode round
    // trip is bit-lossless through a real image format.
    "q_mm_decode_real" -> ((s, dir) =>
      MultimodalOps.decodePngStats(MultimodalOps.encodePng(
          MultimodalOps.syntheticImageMeta(Tables.documents(s, dir))))
        .toDF()
        .orderBy("media_id")),
    // Multimodal near-dup: perceptual average-hash over the DECODED
    // PNGs (integer-exact 8×7 cell grid, 56-bit signature) paired via
    // the same pigeonhole block join as q_simhash_pairs. The oracle
    // recomputes the hash codec-free from the pixel formula and runs
    // the quadratic all-pairs scan — green proves the codec round
    // trip AND pigeonhole completeness in one gate.
    "q_mm_phash" -> ((s, dir) => {
      val sigs = MultimodalOps.pngAHash(MultimodalOps.encodePng(
          MultimodalOps.syntheticImageMeta(Tables.documents(s, dir))))
        .toDF().select(col("media_id").as("id"), col("sig"))
      DedupOps.hammingPairs(sigs, maxHamming = 3, bits = 56)
        .orderBy("id_a", "id_b")
    }),
    // Multimodal: the LOSSY codec tier — real JPEG encode (explicit
    // quality) + decode, certified by |decoded mean - exact mean| <=
    // tol per channel; published sums are the exact (oracle-
    // recomputable) ones, the boolean carries the fidelity proof.
    "q_mm_jpeg" -> ((s, dir) =>
      MultimodalOps.jpegFidelityStats(MultimodalOps.encodeJpeg(
          MultimodalOps.syntheticImageMeta(Tables.documents(s, dir))))
        .toDF()
        .orderBy("media_id")),
    // Multimodal: the REAL audio codec path — deterministic 16-bit PCM
    // stereo samples encoded to genuine WAV files and decoded back
    // through javax.sound.sampled, reduced to exact per-channel sample
    // sums. Oracle recomputes the sums from the sample formula with no
    // codec anywhere (same gate construction as q_mm_decode_real).
    "q_mm_audio_real" -> ((s, dir) =>
      MultimodalOps.decodeWavStats(MultimodalOps.encodeWav(
          MultimodalOps.syntheticAudioMeta(Tables.documents(s, dir))))
        .toDF()
        .orderBy("media_id")),
    // Multimodal: the REAL video codec path — deterministic per-frame
    // pixel patterns encoded as genuine multi-frame animated GIFs
    // (fixed gray palette → lossless) and decoded frame by frame
    // through javax.imageio's sequence reader, reduced to exact
    // per-frame luminance sums. Oracle recomputes every frame's sum
    // from the formula with no codec anywhere — one row per (clip,
    // frame), so a dropped or duplicated frame hash-mismatches.
    "q_mm_video_real" -> ((s, dir) =>
      MultimodalOps.decodeGifFrameStats(MultimodalOps.encodeGif(
          MultimodalOps.syntheticVideoMeta(Tables.documents(s, dir))))
        .toDF()
        .orderBy("media_id", "frame_no")),
    // Structured Streaming: the one-pass sampler + running stats run as
    // a REAL stream (AvailableNow over the parquet source, memory sink)
    // with the same DuckDB oracle as the batch plan — streaming parity
    // is part of the correctness gate, not just a unit test.
    "q_stream_welford" -> ((s, dir) => {
      val stream = Tables.eventsStream(s, dir)
      val sampled = RelationalOps.hashBucketSample(stream, "user_id", 16, 3)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          decMean(col("value")).as("mean_value"),
          round(stddev_pop(col("value")), 4).as("std_value"))
      val qn = s"graft_stream_welford_${StreamSeq.incrementAndGet()}"
      val q = sampled.writeStream.format("memory").queryName(qn)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(qn).orderBy("event_type")
    }),
    // The CUSTOM-STATE streaming path: welfordByKey's explicit
    // flatMapGroupsWithState recurrence (update mode — one cumulative
    // row per key per micro-batch) run as a real stream and gated
    // against the SAME oracle as the batch q_welford UDAF. If
    // AvailableNow splits into several micro-batches, the final state
    // is the row with the largest n per key (n strictly grows).
    "q_stream_welford_state" -> ((s, dir) => {
      import s.implicits._
      val stream = Tables.eventsStream(s, dir)
        .select(col("event_type"), col("value")).as[(String, Double)]
      val stats = graft.streaming.StreamingOps.welfordByKey(stream)
      val qn = s"graft_stream_welford_state_${StreamSeq.incrementAndGet()}"
      val q = stats.toDF().writeStream.format("memory").queryName(qn)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(qn).groupBy(col("key").as("event_type"))
        .agg(max(col("n")).as("n"),
          max_by(round(col("mean"), 4), col("n")).as("mean_value"),
          max_by(round(col("std"), 4), col("n")).as("std_value"))
        .orderBy("event_type")
    }),
    // Watermarked tumbling-window stats as a REAL stream (AvailableNow,
    // complete mode): the standard event-time aggregation shape, gated
    // against the batch date_trunc oracle.
    "q_stream_window" -> ((s, dir) => {
      val stream = Tables.eventsStream(s, dir)
      val agg = graft.streaming.StreamingOps.windowedStats(stream, "ts", "value",
        "1 hour", "2 hours")
      val qn = s"graft_stream_window_${StreamSeq.incrementAndGet()}"
      val q = agg.writeStream.format("memory").queryName(qn)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(qn)
        .select(unix_micros(col("w_start")).as("start_us"), col("n"),
          round(col("mean_value"), 4).as("mean_value"))
        .orderBy("start_us")
    }),
    // Stream–static enrichment: every streamed event picks up its
    // user's dimension attributes (customer stands in for the user
    // table). Stateless append-mode join, static side broadcast per
    // micro-batch; the batch-join oracle proves row-level parity —
    // nothing dropped, nothing duplicated, no state needed.
    "q_stream_static_join" -> ((s, dir) => {
      val stream = Tables.eventsStream(s, dir)
      val dim = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("user_id"),
          col("c_mktsegment").as("segment"), col("c_acctbal"))
      val enriched = graft.streaming.StreamingOps
        .enrichWithStatic(stream, dim, Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("segment"),
          round(col("c_acctbal"), 2).as("acctbal"))
      // file sink: enriched output is corpus-sized (one row per event)
      fileSinkRun(enriched, "enrich").orderBy("event_id")
    }),
    // Streaming exact dedup: first copy per content digest passes, later
    // copies drop (dropDuplicatesWithinWatermark — state keyed by the
    // 16-byte digest, evicted past the horizon). Event time is a
    // deterministic function of doc_id; the corpus span (≤ ~84 min at
    // sf0.1) sits far inside the 30-day horizon, so the stream's answer
    // must equal batch DISTINCT exactly — which doc survives is arrival-
    // order-dependent, so the gate compares the digest SET, not ids.
    "q_stream_dedup" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        // +1 day: an event time of EXACTLY epoch 0 (doc_id 0) equals the
        // stream's initial watermark and is dropped as late — boundary
        // artifact of the synthetic clock, not of the operator
        .withColumn("ts", timestamp_seconds(col("doc_id") + lit(86400L)))
      val deduped = graft.streaming.StreamingOps.streamingExactDedup(
        stream, "ts", "30 days")
      // file sink: the survivor set is corpus-sized (distinct docs)
      fileSinkRun(deduped, "sdedup")
        .select(lower(hex(col("text_hash"))).as("text_hash"))
        .orderBy("text_hash")
    }),
    // Stream-stream interval join: each purchase enriched with the same
    // user's views from the preceding 24 hours — both sides REAL
    // streams with watermarks bounding the buffered state. Inner-join
    // emission is watermark-independent, so the AvailableNow run must
    // produce exactly the batch inequality-join answer. The lookback is
    // sized so the gate is content-bearing at EVERY test SF (80 rows at
    // sf0.001, 8.7k at sf0.1 — a 30-minute lookback emitted 2 rows at
    // sf0.001, testing machinery but not join content).
    "q_stream_interval_join" -> ((s, dir) => {
      def ev = Tables.eventsStream(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_event"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("v_event"),
          col("value").as("v_value"))
      val joined = graft.streaming.StreamingOps.intervalJoin(
        purchases, views, Seq("user_id"), "p_ts", "v_ts", "24 hours", "24 hours")
      // file sink: the join output is DATA-sized (quadratic in a hot
      // user's event density on Zipf corpora) — never driver-collected
      fileSinkRun(joined, "sij")
        .select(col("user_id"), col("p_event"), unix_micros(col("p_ts")).as("p_ts_us"),
          col("v_event"), round(col("v_value"), 4).as("v_value"))
        .orderBy("user_id", "p_event", "v_event")
    }),
    // Per-label embedding centroids through the vector-mean UDAF: one
    // label-keyed exchange shipping (n, 64 decimal sums) buffers — no
    // posexplode row amplification (64× on a 100 TB embedding table),
    // exact order-insensitive decimal sums (see VectorMeanAgg). The
    // float→decimal step rides Spark's own cast chain in the plan.
    "q_centroids" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("label"),
          expr("transform(embedding, x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12)))")
            .as("emb_dec"))
        .groupBy("label")
        .agg(graft.functions.VectorMeanAgg.vectorMean(col("emb_dec")).as("centroid"),
          count(lit(1)).as("n"))
        .select(col("label"), col("n"), posexplode(col("centroid")))
        .select(col("label"), col("n"), col("pos").as("d"),
          round(col("col"), 6).as("c"))
        .orderBy("label", "d")),
    // Momentum gradient descent (Part_2.pdf p.2 Q2): standardized-space
    // optimization from ONE pass over the data (raw-moment algebra);
    // every iteration is driver-side O(p²) — so running to convergence
    // (2000 iterations ≈ free) is exact: the converged β IS the
    // standardized OLS solution, which DuckDB expresses in closed form
    // from corr() — full rows/schema/hash oracle. Trajectory still
    // pinned step-by-step vs Breeze in MomentumGDSpec.
    // Quality-classifier training (fastText-style): full-batch logistic
    // regression via 3 GD rounds on surface features (en-stopword
    // ratio, scaled length) with label lang='en'. 9-dp σ/gradient
    // terms + decimal sums + per-round 9-dp β re-rounding make the
    // whole trajectory replay exactly in the unrolled-CTE oracle;
    // published values are the raw doubles of that chain. NOTE: the
    // driver corpus' lang column is (measured) nearly text-independent
    // — en-marker density 0.057-0.064 across ALL labels — so the
    // majority-class fit the gate converges to IS this data's optimum;
    // RegressionOpsSpec proves real learning (accuracy 1.0, signed β)
    // on a separable corpus.
    "q_logreg_gd" -> ((s, dir) => {
      val ws = Tables.documents(s, dir)
        .select(col("lang"), DedupOps.words(col("text")).as("__ws"))
        .filter(size(col("__ws")) > 0)
      val feats = ws.select(
        (size(filter(col("__ws"), w => w.isin("the", "and", "of", "to", "a")))
          .cast("double") / size(col("__ws")).cast("double")).as("x1"),
        (size(col("__ws")).cast("double") / lit(100.0)).as("x2"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
      RegressionOps.logisticGd(feats, iters = 3, lr = 0.5)
    }),
    "q_momentum_gd" -> ((s, dir) => {
      import s.implicits._
      // spread: the moment aggregation's partial side is decimal-heavy;
      // without the barrier it runs inside the single-split scan task.
      val li = PlanUtils.spread(Tables.lineitem(s, dir).select(
        col("l_quantity").cast("double").as("x1"),
        col("l_discount").cast("double").as("x2"),
        col("l_extendedprice").cast("double").as("y")))
      val fit = graft.functions.MomentumGD.fitStandardized(li, Seq("x1", "x2"), "y",
        iters = 2000, lr = 0.05, gamma = 0.9)
      Seq(("beta_x1", fit.beta(0)), ("beta_x2", fit.beta(1)),
        ("intercept", fit.intercept))
        .toDF("coef", "value")
        .select(col("coef"), round(col("value"), 6).as("value"))
        .orderBy("coef")
    }),
    // Per-class confusion report over the Naive-Bayes eval split:
    // corpus → ONE (true, pred)-keyed aggregate, then class-sized
    // marginal joins; exact-int precision/recall, F1 on those doubles.
    "q_confusion" -> ((s, dir) =>
      EvalOps.confusionReport(
          TextOps.naiveBayes(Tables.documents(s, dir), labelCol = "lang",
            evalMod = 5),
          col("true_label"), col("pred_label"))
        .orderBy("label")),
    // Decision-stump training: exhaustive exact Gini split search on
    // the discretized doc-length feature vs the en label — the full
    // candidate-split table with child counts and rank (rank 1 = the
    // trained stump). Distinct-value-sized after one aggregate.
    "q_stump" -> ((s, dir) =>
      RegressionOps.giniStump(Tables.documents(s, dir),
          expr("n_chars div 16"), col("lang") === "en")
        .orderBy("split")),
    // Experimentation, continuous metric: Welch's unequal-variance
    // t-test per event type on `value` — six decimal accumulators in
    // one group-keyed aggregate, fixed IEEE dag for t and the
    // Welch–Satterthwaite df.
    "q_welch_t" -> ((s, dir) =>
      EvalOps.welchTTest(Tables.events(s, dir), col("event_type"),
          col("user_id"), col("value"))
        .orderBy("grp")),
    // Experimentation: pooled two-proportion A/B z-test per event
    // type — variant = user_id mod 2, success = value > 50. Corpus →
    // one group-keyed aggregate of four exact int64 counters; the z
    // dag is fixed IEEE double ops, bit-identical across engines.
    "q_ab_test" -> ((s, dir) =>
      EvalOps.abTest(Tables.events(s, dir), col("event_type"),
          col("user_id"), col("value") > 50.0)
        .orderBy("grp")),
    // Feature screening: Weight-of-Evidence / Information Value of the
    // doc-length bins against the en label (add-one smoothed).
    "q_woe_iv" -> ((s, dir) =>
      EvalOps.woeIv(Tables.documents(s, dir),
          expr("least(n_chars div 100, 9)"), col("lang") === "en")
        .orderBy(col("bin").asc_nulls_last)),
    // Feature engineering: leave-one-out target encoding of
    // event_type against value (bounded slice published; the encoding
    // statistics come from the FULL corpus).
    "q_target_encode" -> ((s, dir) =>
      RelationalOps.targetEncodeLoo(Tables.events(s, dir),
          col("event_id"), col("event_type"), col("value"))
        .filter(col("id") < 5000)
        .orderBy("id")),
    // Multi-annotator QA: Fleiss' kappa among three raters on the NB
    // eval split — gold, the NB classifier, and the langId heuristic.
    "q_fleiss" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val nb = graft.CacheScope.autoRelease(
        TextOps.naiveBayes(docs, labelCol = "lang", evalMod = 5))
      val lid = TextAnalysisOps.langId(docs.filter(col("doc_id") % 5 === 0))
      val ratings = nb.select(col("doc_id"), col("true_label").as("label"))
        .unionByName(nb.select(col("doc_id"), col("pred_label").as("label")))
        .unionByName(lid.select(col("doc_id"), col("lang_pred").as("label")))
      EvalOps.fleissKappa(ratings, col("doc_id"), col("label"), m = 3)
        .orderBy("label")
    }),
    // Sequential patterns: frequent adjacent 3-step event-type paths
    // per user timeline, support-filtered and ranked.
    "q_path3" -> ((s, dir) =>
      TemporalOps.pathCounts3(Tables.events(s, dir), Seq("user_id"), "ts",
          "event_type", "event_id", minSupport = 5)
        .orderBy("rk")),
    // Preference modeling: Bradley–Terry strengths over pairwise
    // "duels" — consecutive same-user events of different types, the
    // higher value wins (the RLHF reward-data shape). 5 MM rounds.
    "q_bradley_terry" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("t1"), col("value").as("v1"))
        .withColumn("t2", lead(col("t1"), 1).over(w))
        .withColumn("v2", lead(col("v1"), 1).over(w))
        .filter(col("t2").isNotNull && col("t1") =!= col("t2")
          && col("v1") =!= col("v2"))
        .select(
          when(col("v1") > col("v2"), col("t1")).otherwise(col("t2")).as("winner"),
          when(col("v1") > col("v2"), col("t2")).otherwise(col("t1")).as("loser"))
      EvalOps.bradleyTerry(pairs, col("winner"), col("loser"), rounds = 5)
        .orderBy("item")
    }),
    // Survival analysis: Kaplan–Meier user-retention curve; users
    // last seen within 6h of the corpus horizon are right-censored
    // (the corpus' inter-event cadence is hours, not days).
    "q_km_survival" -> ((s, dir) =>
      TemporalOps.kmSurvival(Tables.events(s, dir), unitUs = 21600000000L)
        .orderBy("t")),
    // Classifier evaluation: exact tie-aware ROC curve + AUC (Mann–
    // Whitney rank-sum, BIGINT mid-ranks) of the doc-length score
    // against the en label. Corpus → ONE score-keyed aggregate; every
    // window after that is metric-sized.
    "q_roc_auc" -> ((s, dir) =>
      EvalOps.rocAuc(Tables.documents(s, dir),
          expr("n_chars div 16"), col("lang") === "en")
        .orderBy("score")),
    // Score calibration: reliability bins + ECE of the stopword-ratio
    // confidence (the q_logreg_gd feature) against the en label. Each
    // published rate is one exact-int IEEE division; bin means are
    // decimal sums of 9-dp confs.
    "q_calibration" -> ((s, dir) => {
      val ws = Tables.documents(s, dir)
        .select(col("lang"), DedupOps.words(col("text")).as("__ws"))
        .filter(size(col("__ws")) > 0)
      val conf = round(
        size(filter(col("__ws"), w => w.isin("the", "and", "of", "to", "a")))
          .cast("double") / size(col("__ws")).cast("double"), 9)
      EvalOps.calibration(ws, conf, col("lang") === "en", nBins = 10)
        .orderBy("bin")
    }),
    // Ranking evaluation: NDCG@10 of the RRF-fused hybrid ranking
    // against graded relevance from the exact cosine ranks (3/2/1 for
    // ranks ≤2/≤5/≤10) — the retrieval-quality gate for the fusion
    // operator. The cosine lists feed BOTH the fusion and the
    // relevance side (one scope-cached computation).
    "q_ndcg" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cos = graft.CacheScope.autoRelease(
        SimilarityOps.bruteForceTopK(emb, col("vec_id") < 10, 10))
      val l2 = SimilarityOps.bruteForceTopKL2(emb, col("vec_id") < 10, 10)
      val fused = SimilarityOps.rrfFuse(Seq(cos, l2), topK = 10)
        .select(col("q_id"), col("nn_id"), col("fused_rank").as("pos"))
      val rels = cos.select(col("q_id"), col("nn_id"),
        when(col("rank") <= 2, 3L).when(col("rank") <= 5, 2L).otherwise(1L)
          .as("rel"))
      EvalOps.ndcgAtK(fused, rels, 10).orderBy("q_id")
    }),
    // Distribution-drift monitor: PSI between the even- and odd-doc_id
    // snapshot halves over length bins — the "did the input move"
    // check every scored production corpus runs against a reference.
    // Laplace add-one keeps bin probabilities integer-exact.
    "q_psi" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      EvalOps.psi(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
          docs.filter(pmod(col("doc_id"), lit(2)) === 1),
          expr("least(n_chars div 100, 9)"), nBins = 10)
        .orderBy("bin")
    }),
    // Label-noise screen: kNN (k=5) neighbor-vote agreement on the
    // embedding labels — strict-minority agreement flags likely
    // mislabels for re-annotation (edited-nearest-neighbor shape).
    "q_label_noise" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      EvalOps.labelNoise(SimilarityOps.knnLists(emb, 5), emb)
        .orderBy("vec_id")
    }),
    // Hashing-trick vectorization: vocabulary-free signed 64-bucket
    // bag-of-words (md5 open hash → bucket + sign), per-doc sparse
    // rows with nnz and ‖v‖². Bounded slice (doc_id < 50) published.
    "q_feature_hash" -> ((s, dir) =>
      TextAnalysisOps.featureHash(
          Tables.documents(s, dir).filter(col("doc_id") < 50), nBuckets = 64)
        .orderBy("doc_id", "bucket")),
    // Corpus-concentration data card: Lorenz curve + exact grouped
    // Gini over tokens-per-document — "how much of the corpus sits in
    // its largest docs". One value-keyed aggregate; windows run over
    // distinct token counts only.
    "q_token_gini" -> ((s, dir) =>
      EvalOps.lorenzGini(
          Tables.documents(s, dir)
            .select(size(DedupOps.words(col("text"))).as("n_tok")),
          col("n_tok"))
        .orderBy("v")),
    // STREAMING drift monitor: per-day value-bin counts accumulate as
    // a real watermarked stream (bin-bounded window state), then each
    // window's distribution is PSI-scored against the full-corpus
    // static reference — the "did today's data move" production check.
    "q_stream_psi" -> ((s, dir) => {
      val binned = graft.streaming.StreamingOps.windowedBinCounts(
        Tables.eventsStream(s, dir), "ts", "value",
        "1 day", "2 days", binWidth = 50.0, maxBin = 9)
      val qn = s"graft_stream_psi_${StreamSeq.incrementAndGet()}"
      val q = binned.writeStream.format("memory").queryName(qn)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val cur = s.table(qn)
        .select(unix_micros(col("w_start")).as("grp"), col("bin"), col("cnt"))
      val ref = Tables.events(s, dir)
        .select(least(floor(col("value") / 50.0), lit(9L)).cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("cnt_ref"))
      EvalOps.psiByGroup(cur, ref, nBins = 10)
        .withColumnRenamed("grp", "start_us")
        .orderBy("start_us", "bin")
    }),
    // Hard-negative mining (contrastive-training data prep): per query
    // the top-5 most-similar DIFFERENT-label vectors — label mismatch
    // filtered before the bounded heap, so positives never hold slots.
    "q_hard_negatives" -> ((s, dir) =>
      SimilarityOps.hardNegatives(Tables.embeddings(s, dir),
          col("vec_id") < 10, k = 5)
        .select(col("q_id"), col("label_q"), col("nn_id"), col("label_n"),
          round(col("sim"), 6).as("sim"), col("rank"))
        .orderBy("q_id", "rank")),
    // Sliced evaluation: per-source AUC of the length score — the
    // slice report that catches regressions a global AUC hides.
    // Every window partitions BY SLICE; degenerate slices null out.
    "q_sliced_auc" -> ((s, dir) =>
      EvalOps.rocAucBySlice(Tables.documents(s, dir), col("source"),
          expr("n_chars div 16"), col("lang") === "en")
        .orderBy("slice")),
    // Split-conformal outlier calibration: thresholds from the
    // calibration split's exact integer ranks (milli-α BIGINT grid),
    // flag rates + finite-sample validity bound checked on eval.
    "q_conformal" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      EvalOps.conformalOutliers(
          docs.filter(pmod(col("doc_id"), lit(5)) === 0),
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          col("n_chars"), alphas = Seq(0.1, 0.05, 0.01))
        .orderBy("alpha")
    }),
    // Exact two-sample KS drift test between snapshot halves over doc
    // length — the binning-free companion to q_psi; the max runs on
    // cross-multiplied BIGINTs, divided once at the end.
    "q_ks_drift" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      EvalOps.ksDrift(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
          docs.filter(pmod(col("doc_id"), lit(2)) === 1),
          col("n_chars"))
        .orderBy("v")
    }),
    // Exact equi-depth histogram — the range-partitioner planning
    // primitive: BIGINT rank boundaries + the realized per-bucket
    // counts (the skew a range partition on this key would inherit).
    "q_equidepth" -> ((s, dir) =>
      DataQualityOps.equiDepth(Tables.documents(s, dir), col("n_chars"),
          nBuckets = 10)
        .orderBy("bucket")),
    // Hot-key skew diagnostics: top-10 heaviest event keys with share
    // and ratio-to-mean — the observability report that says when to
    // flip the salting hatches.
    "q_skew_report" -> ((s, dir) =>
      DataQualityOps.skewReport(Tables.events(s, dir), col("user_id"), k = 10)
        .orderBy("rank"))
  )

  /** CF query items (exist with ≥25 raters at every sf — FIXTURES.md). */
  private val CfTargets = Seq(3L, 7L)

  private val HourUs = 3600L * 1000000L

  /** 20 overlapping 48 h maintenance windows on a 36 h stride from
    * 2024-01-01 — shared by q_range_join (explicit bucketized operator)
    * and q_range_join_rule (naive join + optimizer rule), which must
    * stay the same query for their common oracle to hash-match.
    */
  private def maintenanceWindows(s: SparkSession): DataFrame = {
    import s.implicits._
    val baseUs = 1704067200000000L // 2024-01-01 00:00:00 UTC
    (0L until 20L).map { w =>
      (w, baseUs + w * 36 * HourUs, baseUs + w * 36 * HourUs + 48 * HourUs)
    }.toDF("w_id", "w_start_us", "w_end_us")
      .select(col("w_id"), timestamp_micros(col("w_start_us")).as("w_start"),
        timestamp_micros(col("w_end_us")).as("w_end"))
  }

  /** Collision-free memory-sink names if a streaming query reruns in
    * one session (no RNG/clock — determinism policy).
    */
  private val StreamSeq = new java.util.concurrent.atomic.AtomicInteger()

  /** Run an append-mode stream through a PARQUET file sink and read the
    * result back — the production sink shape for DATA-SIZED streaming
    * output. The memory sink collects every result row onto the driver:
    * fine for the metric-sized aggregate gates, but a measured
    * `spark.driver.maxResultSize` abort for the interval join on the
    * Zipf-headed sf1 corpus (the hot user's join output alone is tens
    * of millions of rows). The file sink keeps rows on executors end to
    * end; reading the sink directory back is metadata-driven
    * (_spark_metadata), so the gate compares exactly what the stream
    * committed.
    */
  private def fileSinkRun(df: DataFrame, tag: String): DataFrame = {
    val spark = df.sparkSession
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_${tag}_${StreamSeq.incrementAndGet()}_")
      .toString
    val q = df.writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/chk")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.schema(df.schema).parquet(s"$dir/out")
  }

  /** Order-insensitive mean: exact decimal sum, then one double divide.
    * Plain `round(avg(double),4)` can flip the last digit between Spark
    * and DuckDB because partial-sum order differs; the decimal sum is
    * exact in both engines so the quotient is bit-identical.
    */
  /** DuckDB replay of [[SimilarityOps.powerIterationPC]]: the same
    * recurrence unrolled as chained CTEs (the q_pagerank oracle
    * pattern). Every CTE is MATERIALIZED — DuckDB inlines plain CTEs,
    * and each round references the previous one ~4×, so un-hinted the
    * replay re-evaluates the chain 4^iters times (measured: a hang at
    * sf0.001; 0.1 s materialized). Cross-row sums cast products to
    * DECIMAL(38,12) like the engine; the final round(…, 6) absorbs the
    * engines' scale-12 cast-tie divergence (see the operator scaladoc).
    */
  private def pcaOracleSql(dims: Int, iters: Int): String = {
    val its = (1 to iters).map { t =>
      val pv = s"v${t - 1}"
      s"""dot$t AS MATERIALIZED (SELECT id, CAST(sum(CAST(x.e * v.w AS DECIMAL(38,12))) AS DOUBLE) AS dot
         |  FROM x JOIN $pv v USING (dim) GROUP BY id),
         |s$t AS MATERIALIZED (SELECT x.dim, CAST(sum(CAST(x.e * dot$t.dot AS DECIMAL(38,12))) AS DOUBLE) AS s
         |  FROM x JOIN dot$t USING (id) GROUP BY x.dim),
         |mv$t AS MATERIALIZED (SELECT CAST(sum(CAST(mu.mu * v.w AS DECIMAL(38,12))) AS DOUBLE) AS dm
         |  FROM mu JOIN $pv v USING (dim)),
         |w$t AS MATERIALIZED (SELECT s$t.dim,
         |    s$t.s - (SELECT n FROM nn) * mu.mu * (SELECT dm FROM mv$t) AS w
         |  FROM s$t JOIN mu USING (dim)),
         |v$t AS MATERIALIZED (SELECT dim, w / (SELECT max(abs(w)) FROM w$t) AS w FROM w$t)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH x AS MATERIALIZED (
       |  SELECT vec_id AS id, d AS dim, CAST(embedding[d+1] AS DOUBLE) AS e
       |  FROM embeddings, range($dims) r(d)),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM embeddings),
       |mu AS MATERIALIZED (SELECT dim, CAST(sum(CAST(e AS DECIMAL(38,12))) AS DOUBLE)
       |              / (SELECT n FROM nn) AS mu FROM x GROUP BY dim),
       |v0 AS MATERIALIZED (SELECT d AS dim, CAST(1.0 AS DOUBLE) AS w FROM range($dims) r(d)),
       |$its,
       |nrm AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(w * w AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
       |        FROM v$iters)
       |SELECT CAST(dim AS INTEGER) AS dim,
       |       round(w / (SELECT nrm FROM nrm), 6) AS loading
       |FROM v$iters ORDER BY dim""".stripMargin
  }

  /** q_kmeans oracle: `iters` Lloyd iterations unrolled as chained
    * MATERIALIZED CTEs (the pcaOracleSql pattern). Each iteration: a
    * one-row centroid CTE (k×dims columns), distances as left-assoc
    * `+` chains in dimension order (the engine's fold association),
    * lowest-index argmin via the same strict `<=` cascade, centroid
    * update as conditional DECIMAL(38,12) sums over one scan. Init =
    * the vectors of vec_id 0..k−1 (ids are dense from 0 at every SF).
    */
  private def kmeansOracleSql(dims: Int, k: Int, iters: Int): String =
    s"""WITH ${kmeansCtes(dims, k, iters)}
       |SELECT vec_id, cluster, dist2 FROM asg ORDER BY vec_id""".stripMargin

  /** The kmeans replay as a reusable CTE chain ending in
    * `asg(vec_id, cluster, dist2)` — shared by q_kmeans and the
    * SemDeDup oracle (which appends within-cluster cosine CTEs).
    */
  private def kmeansCtes(dims: Int, k: Int, iters: Int): String = {
    val xCols = (0 until dims)
      .map(d => s"CAST(embedding[${d + 1}] AS DOUBLE) AS x$d").mkString(", ")
    val cent0 = (0 until k).flatMap(j => (0 until dims).map(d =>
      s"max(CASE WHEN vec_id = $j THEN x$d END) AS c${j}_$d")).mkString(", ")
    def distCols = (0 until k).map(j =>
      (0 until dims).map(d => s"(x$d - c${j}_$d) * (x$d - c${j}_$d)")
        .mkString(" + ") + s" AS d$j").mkString(", ")
    val argmin = {
      val cases = (0 until k - 1).map { j =>
        val conds = ((j + 1) until k).map(i => s"d$j <= d$i").mkString(" AND ")
        s"WHEN $conds THEN $j"
      }.mkString(" ")
      s"CASE $cases ELSE ${k - 1} END"
    }
    val steps = (1 to iters).map { t =>
      val upd = (0 until k).flatMap(j => (0 until dims).map(d =>
        s"CAST(sum(CASE WHEN cl = $j THEN CAST(x$d AS DECIMAL(38,12)) END) AS DOUBLE)" +
          s" / count(CASE WHEN cl = $j THEN 1 END) AS c${j}_$d")).mkString(", ")
      s"""a$t AS MATERIALIZED (
         |  SELECT *, $argmin AS cl
         |  FROM (SELECT x.*, $distCols FROM x CROSS JOIN cent${t - 1}) s$t
         |),
         |cent$t AS MATERIALIZED (SELECT $upd FROM a$t),""".stripMargin
    }.mkString("\n")
    val leastArgs = (0 until k).map(j => s"d$j").mkString(", ")
    s"""x AS MATERIALIZED (SELECT vec_id, $xCols FROM embeddings),
       |cent0 AS MATERIALIZED (SELECT $cent0 FROM x WHERE vec_id < $k),
       |$steps
       |f AS (SELECT vec_id, $distCols FROM x CROSS JOIN cent$iters),
       |asg AS MATERIALIZED (
       |  SELECT vec_id, $argmin AS cluster, round(least($leastArgs), 6) AS dist2
       |  FROM f
       |)""".stripMargin
  }

  /** DuckDB replay of [[TextOps.bpeMerges]] as unrolled MATERIALIZED CTEs
    * (the kmeans/pagerank pattern — each round's wf CTE is referenced
    * twice, so materialization is load-bearing, NOTES.md). Same ␁-wrapped
    * symbol encoding; merge = literal `replace` (left-to-right
    * non-overlapping in both engines = greedy BPE); ties on
    * (n DESC, l, r) binary order.
    */
  /** chr(1) — the BPE symbol sentinel in DuckDB. */
  private val BpeS = "chr(1)"

  /** The shared BPE training CTE chain (toks/wf0/p·t·wf per round) —
    * replays [[operators.TextOps]]' merge loop verbatim; `where` scopes
    * the training corpus (empty = all docs). Ends with a trailing comma
    * so callers append their own tail CTEs.
    */
  private def bpeTrainCtes(rounds: Int, where: String): String = {
    val S = BpeS
    val steps = (1 to rounds).map { t =>
      s"""p$t AS MATERIALIZED (
         |  SELECT syms[i+1] AS l, syms[i+2] AS r, CAST(sum(freq) AS BIGINT) AS n
         |  FROM (SELECT str_split(trim(enc, $S), $S || $S) AS syms, freq FROM wf${t - 1}) s$t
         |  JOIN range(128) ix$t(i) ON i + 2 <= len(syms)
         |  GROUP BY 1, 2
         |),
         |t$t AS MATERIALIZED (SELECT l, r, n FROM p$t ORDER BY n DESC, l ASC, r ASC LIMIT 1),
         |wf$t AS MATERIALIZED (
         |  SELECT freq, replace(enc, $S || l || $S || $S || r || $S, $S || l || r || $S) AS enc
         |  FROM wf${t - 1}, t$t
         |),""".stripMargin
    }.mkString("\n")
    s"""toks AS MATERIALIZED (
       |  SELECT unnest(regexp_extract_all(lower(text), '((?:[\\.,!?;"])|(?:(?:\\#|\\@)?[A-Za-z0-9_\\-]+(?:''[a-z]{1,3})?))', 1)) AS word
       |  FROM documents $where
       |), wf0 AS MATERIALIZED (
       |  SELECT count(*) AS freq,
       |         array_to_string(list_transform(str_split(word, ''), c -> $S || c || $S), '') AS enc
       |  FROM toks GROUP BY word
       |),
       |$steps""".stripMargin
  }

  private def bpeMergesOracleSql(rounds: Int, vocabTopK: Int): String = {
    val S = BpeS
    val mergeRows = (1 to rounds).map(t =>
      s"SELECT $t AS round, 'merge' AS kind, l, r, n FROM t$t").mkString("\nUNION ALL ")
    s"""WITH ${bpeTrainCtes(rounds, "")}
       |vocab AS MATERIALIZED (
       |  SELECT sym, CAST(sum(freq) AS BIGINT) AS n FROM (
       |    SELECT unnest(str_split(trim(enc, $S), $S || $S)) AS sym, freq FROM wf$rounds
       |  ) ex GROUP BY sym ORDER BY n DESC, sym ASC LIMIT $vocabTopK
       |)
       |$mergeRows
       |UNION ALL SELECT 0 AS round, 'vocab' AS kind, sym AS l, '' AS r, n FROM vocab""".stripMargin
  }

  /** Oracle for q_bpe_encode: replay the train loop on the train split,
    * then apply each round's selected pair (in order) to the distinct
    * eval vocabulary via the same literal replace, and aggregate per
    * eval doc.
    */
  private def bpeEncodeOracleSql(rounds: Int, evalMod: Long): String = {
    val S = BpeS
    val apply = (1 to rounds).map { t =>
      s"""evv$t AS (
         |  SELECT word, replace(enc, $S || l || $S || $S || r || $S, $S || l || r || $S) AS enc
         |  FROM evv${t - 1}, t$t
         |),""".stripMargin
    }.mkString("\n")
    s"""WITH ${bpeTrainCtes(rounds, s"WHERE doc_id % $evalMod <> 0")}
       |ev AS MATERIALIZED (
       |  SELECT doc_id, word, count(*) AS cnt FROM (
       |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '((?:[\\.,!?;"])|(?:(?:\\#|\\@)?[A-Za-z0-9_\\-]+(?:''[a-z]{1,3})?))', 1)) AS word
       |    FROM documents WHERE doc_id % $evalMod = 0
       |  ) et GROUP BY 1, 2
       |),
       |evv0 AS MATERIALIZED (
       |  SELECT word,
       |         array_to_string(list_transform(str_split(word, ''), c -> $S || c || $S), '') AS enc
       |  FROM (SELECT DISTINCT word FROM ev) dw
       |),
       |$apply
       |ns AS (
       |  SELECT word, CAST(len(str_split(trim(enc, $S), $S || $S)) AS BIGINT) AS n_syms
       |  FROM evv$rounds
       |)
       |SELECT ev.doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,
       |       CAST(sum(cnt * n_syms) AS BIGINT) AS n_tokens,
       |       round(CAST(sum(cnt * n_syms) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6) AS tokens_per_word
       |FROM ev JOIN ns USING (word)
       |GROUP BY ev.doc_id ORDER BY ev.doc_id""".stripMargin
  }

  private def decMean(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(sum(c.cast("decimal(28,12)")).cast("double") / count(lit(1)), 4)

  /** DuckDB rendering of [[decMean]]. */
  private def decMeanSql(expr: String): String =
    s"round(CAST(sum(CAST($expr AS DECIMAL(28,12))) AS DOUBLE) / count(*), 4)"

  /** Top-k size for the regression pipeline (reference uses 1000 on a
    * real vocabulary; the synthetic corpus has ~31 distinct tokens).
    */
  private val RegK = 20

  /** Shared observations: outcome = 1 + n_chars%5, control = doc_id%3==0. */
  private def regObs(s: SparkSession, dir: String): DataFrame =
    RegressionOps.denseWordObservations(Tables.documents(s, dir), RegK,
      lit(1) + pmod(col("n_chars"), lit(5L)),
      (pmod(col("doc_id"), lit(3L)) === 0).cast("int"))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = oracleSqlTextAnalysis ++ Map(
    "q_topk_words" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(regexp_extract_all(lower(text), '((?:[\.,!?;"])|(?:(?:\#|\@)?[A-Za-z0-9_\-]+(?:''[a-z]{1,3})?))', 1)) AS word
        |  FROM documents
        |) t GROUP BY word
        |ORDER BY cnt DESC, word ASC LIMIT 100""".stripMargin,
    // Zipf fit replay: same tokenizer + top-100 rank order, each ln at
    // 9 dp, cross terms single-rounded, DECIMAL sums, one IEEE dag for
    // slope/intercept/r² at 6 dp
    "q_zipf" ->
      """WITH wc AS MATERIALIZED (
        |  SELECT word, count(*) AS cnt FROM (
        |    SELECT unnest(regexp_extract_all(lower(text), '((?:[\.,!?;"])|(?:(?:\#|\@)?[A-Za-z0-9_\-]+(?:''[a-z]{1,3})?))', 1)) AS word
        |    FROM documents
        |  ) t GROUP BY word
        |), ranked AS (
        |  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, word ASC) AS rank
        |  FROM wc QUALIFY rank <= 100
        |), t AS (
        |  SELECT round(ln(CAST(rank AS DOUBLE)), 9) AS x,
        |         round(ln(CAST(cnt AS DOUBLE)), 9) AS y
        |  FROM ranked
        |), s AS (
        |  SELECT count(*) AS n,
        |         CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
        |         CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(round(x * x, 9) AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
        |         CAST(sum(CAST(round(x * y, 9) AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
        |         CAST(sum(CAST(round(y * y, 9) AS DECIMAL(38,12))) AS DOUBLE) AS syy
        |  FROM t
        |), f AS (
        |  SELECT n, sx, sy, sxx, sxy, syy,
        |         n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
        |  FROM s
        |)
        |SELECT n, round(num / den, 6) AS slope,
        |       round((sy - num / den * sx) / n, 6) AS intercept,
        |       round(num * num / (den * (n * syy - sy * sy)), 6) AS r2
        |FROM f""".stripMargin,
    // dense bucket axis per user via generate-series over the span;
    // integer // on epoch micros matches the engine's div exactly
    "q_fill_gaps" ->
      """WITH c AS (
        |  SELECT user_id, epoch_us(ts) // 21600000000 AS bucket, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), s AS (
        |  SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM c GROUP BY 1
        |), dense AS (
        |  SELECT user_id, b0 + i AS bucket FROM s JOIN range(200) t(i) ON i <= b1 - b0
        |)
        |SELECT d.user_id, d.bucket * 21600000000 AS bucket_us,
        |       coalesce(n, 0) AS n
        |FROM dense d LEFT JOIN c ON c.user_id = d.user_id AND c.bucket = d.bucket
        |ORDER BY d.user_id, bucket_us""".stripMargin,
    // BPE primitive: same tokenizer, word-frequency table first, then
    // pairs of distinct words weighted by freq — mirrors the engine's
    // aggregate-before-explode plan
    "q_bpe_pairs" ->
      """WITH wf AS (
        |  SELECT word, count(*) AS freq FROM (
        |    SELECT unnest(regexp_extract_all(lower(text), '((?:[\.,!?;"])|(?:(?:\#|\@)?[A-Za-z0-9_\-]+(?:''[a-z]{1,3})?))', 1)) AS word
        |    FROM documents
        |  ) t GROUP BY word
        |), p AS (
        |  SELECT substring(word, i + 1, 2) AS pair, freq
        |  FROM wf JOIN range(64) r(i) ON i + 2 <= length(word)
        |  WHERE length(word) >= 2
        |)
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS n
        |FROM p GROUP BY pair
        |ORDER BY n DESC, pair ASC LIMIT 50""".stripMargin,
    // Full BPE trainer replay: 8 unrolled merge rounds + final vocab
    // (generator below — kmeans/pagerank MATERIALIZED-CTE pattern)
    "q_bpe_merges" -> bpeMergesOracleSql(8, 20),
    "q_bpe_encode" -> bpeEncodeOracleSql(8, 5),
    // tf/df/N recomputed relationally; rank key round(s,9)+word mirrors
    // the engine's TopKPerKey ordering; constants written as the same
    // double EXPRESSIONS ((1.2+1.0), (1.0-0.75)) the Scala side
    // computes, so both engines derive identical IEEE values
    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '((?:[\.,!?;"])|(?:(?:\#|\@)?[A-Za-z0-9_\-]+(?:''[a-z]{1,3})?))', 1)) AS word
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word
        |), dfq AS (
        |  SELECT word, count(*) AS df FROM tf GROUP BY word
        |), n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.word, t.tf,
        |         t.tf * ln(CAST(n.n_docs AS DOUBLE) / dfq.df) AS s
        |  FROM tf t JOIN dfq USING (word) CROSS JOIN n
        |), ranked AS (
        |  SELECT doc_id, word, tf, s,
        |         row_number() OVER (PARTITION BY doc_id
        |                            ORDER BY round(s, 9) DESC, word) AS rn
        |  FROM scored
        |)
        |SELECT doc_id, word, tf, round(s, 6) AS tfidf
        |FROM ranked WHERE rn <= 3 ORDER BY doc_id, word""".stripMargin,
    "q_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '((?:[\.,!?;"])|(?:(?:\#|\@)?[A-Za-z0-9_\-]+(?:''[a-z]{1,3})?))', 1)) AS word
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word
        |), dl AS (
        |  -- sum(BIGINT) is HUGEINT in DuckDB; the engine emits BIGINT
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
        |), dfq AS (
        |  SELECT word, count(*) AS df FROM tf GROUP BY word
        |), st AS (
        |  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
        |), scored AS (
        |  SELECT t.doc_id, t.word, t.tf, d.dl,
        |         ln((st.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0)
        |           * t.tf * (1.2 + 1.0)
        |           / (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * d.dl / st.avgdl)) AS s
        |  FROM tf t JOIN dfq q USING (word) JOIN dl d USING (doc_id) CROSS JOIN st
        |), ranked AS (
        |  SELECT doc_id, word, tf, dl, s,
        |         row_number() OVER (PARTITION BY doc_id
        |                            ORDER BY round(s, 9) DESC, word) AS rn
        |  FROM scored
        |)
        |SELECT doc_id, word, tf, dl, round(s, 6) AS score
        |FROM ranked WHERE rn <= 3 ORDER BY doc_id, word""".stripMargin,
    "q_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '((?:[\.,!?;"])|(?:(?:\#|\@)?[A-Za-z0-9_\-]+(?:''[a-z]{1,3})?))', 1)) AS word
        |  FROM documents
        |), tot AS (SELECT count(*) AS n FROM toks)
        |SELECT word, count(*) AS est_cnt
        |FROM toks, tot GROUP BY word, tot.n
        |HAVING count(*) >= 0.02 * n
        |ORDER BY word""".stripMargin,
    "q_char_hist" ->
      """WITH perdoc AS (
        |  SELECT doc_id, ch, count(*) AS n FROM (
        |    SELECT doc_id, unnest(string_split(regexp_replace(lower(text), '[^a-z]', '', 'g'), '')) AS ch
        |    FROM documents
        |  ) x WHERE ch <> '' GROUP BY doc_id, ch
        |), alphabet AS (
        |  SELECT chr((97 + i)::INTEGER) AS ch FROM range(26) t(i)
        |), dense AS (
        |  SELECT a.ch, coalesce(p.n, 0) AS n
        |  FROM (SELECT DISTINCT doc_id FROM documents) d
        |  CROSS JOIN alphabet a
        |  LEFT JOIN perdoc p ON p.doc_id = d.doc_id AND p.ch = a.ch
        |)
        |SELECT ch, round(avg(n), 4) AS mean_n, round(stddev_pop(n), 4) AS std_n
        |FROM dense GROUP BY ch ORDER BY ch""".stripMargin,
    "q_set_diff" ->
      """SELECT custkey FROM (
        |  (SELECT DISTINCT o_custkey AS custkey FROM orders)
        |  EXCEPT
        |  (SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
        |) t ORDER BY custkey""".stripMargin,
    "q_hash_sample" ->
      s"""SELECT count(*) AS n, ${decMeanSql("value")} AS mean_value,
         |       round(stddev_pop(value), 4) AS std_value
         |FROM events WHERE (user_id * 2654435761) % 16 = 3""".stripMargin,
    "q_semi_sample" ->
      s"""SELECT user_id, count(*) AS n_tx, ${decMeanSql("value")} AS mean_value
         |FROM events WHERE user_id IN (
         |  SELECT DISTINCT user_id FROM events WHERE (user_id * 2654435761) % 16 = 3)
         |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_uniform_sample" ->
      """SELECT event_id, user_id, event_type, round(value, 4) AS value FROM (
        |  SELECT * FROM events
        |  ORDER BY md5(CAST(event_id AS VARCHAR) || '|graft') LIMIT 1000
        |) t ORDER BY event_id""".stripMargin,
    "q_sample_frac" ->
      s"""SELECT count(*) AS n, ${decMeanSql("value")} AS mean_value
         |FROM events
         |WHERE ('0x' || substring(md5(CAST(event_id AS VARCHAR) || '|graft'), 1, 6))::BIGINT
         |      / 16777216.0 < 0.01""".stripMargin,
    // same md5 shuffle key + 24-bit shard draw; row_number replays the
    // per-shard order with the key as tiebreak
    "q_train_order" ->
      """WITH h AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || '|ep1') AS skey
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, skey,
        |         ('0x' || substring(skey, 1, 6))::BIGINT % 16 AS shard
        |  FROM h
        |), p AS (
        |  SELECT doc_id, shard,
        |         row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) - 1
        |           AS pos_in_shard
        |  FROM s
        |)
        |SELECT doc_id, shard, pos_in_shard,
        |       pos_in_shard * 16 + shard AS global_pos
        |FROM p ORDER BY doc_id""".stripMargin,
    "q_stratified_sample" ->
      """SELECT event_id, user_id, event_type, round(value, 4) AS value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |           ORDER BY md5(CAST(event_id AS VARCHAR) || '|strat')) AS rn
        |  FROM events) t
        |WHERE rn <= 50 ORDER BY event_type, event_id""".stripMargin,
    "q_dedup_last" ->
      s"""WITH ${Ratings.OracleDedupCte}
         |SELECT user_id, item_id, rating FROM ratings
         |ORDER BY user_id, item_id""".stripMargin,
    "q_support_items" ->
      s"""WITH ${Ratings.OracleDedupCte}
         |SELECT item_id, count(DISTINCT user_id) AS n_support
         |FROM ratings GROUP BY item_id
         |HAVING count(DISTINCT user_id) >= 25
         |ORDER BY item_id""".stripMargin,
    "q_distinct_users" ->
      "SELECT DISTINCT user_id FROM events ORDER BY user_id",
    "q_welford" -> WelfordOracle,
    // identical semantics by construction: the custom-state streaming
    // run must converge to the batch Welford answer
    "q_stream_welford_state" -> WelfordOracle,
    "q_matmul" ->
      """WITH m AS (
        |  SELECT vec_id AS i, t.j, CAST(embedding[t.j + 1] AS DOUBLE) AS v
        |  FROM embeddings, range(64) t(j) WHERE label < 5 AND vec_id < 100
        |), n AS (
        |  SELECT t.j, vec_id AS k, CAST(embedding[t.j + 1] AS DOUBLE) AS v
        |  FROM embeddings, range(64) t(j) WHERE label >= 5 AND vec_id < 100
        |)
        |SELECT m.i, n.k, round(sum(m.v * n.v), 6) AS v
        |FROM m JOIN n ON m.j = n.j
        |GROUP BY m.i, n.k ORDER BY i, k""".stripMargin,
    "q_reg_simple" ->
      s"""$RegObsCte
         |SELECT word, count(*) AS n, round(corr(x, y), 6) AS beta,
         |       round(corr(x, y) * sqrt((count(*) - 2)
         |             / (1 - corr(x, y) * corr(x, y))), 6) AS t
         |FROM dense GROUP BY word
         |ORDER BY beta DESC, word""".stripMargin,
    "q_reg_multi" ->
      s"""$RegObsCte,
         |st AS (
         |  SELECT word, count(*) AS n, corr(x, y) AS ry1, corr(c, y) AS ry2,
         |         corr(x, c) AS r12
         |  FROM dense GROUP BY word
         |)
         |SELECT word, n,
         |       round((ry1 - ry2 * r12) / (1 - r12 * r12), 6) AS beta1,
         |       round((ry2 - ry1 * r12) / (1 - r12 * r12), 6) AS beta2,
         |       round(((ry1 - ry2 * r12) / (1 - r12 * r12))
         |             * sqrt((n - 3) * (1 - r12 * r12)
         |                    / (1 - (ry1*ry1 + ry2*ry2 - 2*ry1*ry2*r12) / (1 - r12*r12))), 6) AS t1
         |FROM st ORDER BY beta1 DESC, word""".stripMargin,
    "q_cf_sims" ->
      s"""WITH ${Ratings.OracleDedupCte},
         |$CfCte
         |SELECT t_item, item_id, round(sim, 6) AS sim, n_common
         |FROM nbrs ORDER BY t_item, item_id""".stripMargin,
    // the salted plan form is output-identical by construction — the
    // SAME oracle gates both (hash equality across plan forms)
    "q_cf_sims_salted" ->
      s"""WITH ${Ratings.OracleDedupCte},
         |$CfCte
         |SELECT t_item, item_id, round(sim, 6) AS sim, n_common
         |FROM nbrs ORDER BY t_item, item_id""".stripMargin,
    // ALS: same int64 normal-equation sums (DuckDB sum → HUGEINT, so
    // CAST to BIGINT), same double Cramer solve, 6-dp publish
    "q_als_round" -> AlsUserOracle,
    // item half-step: the published (rounded, hence engine-identical)
    // user factors feed per-item ridge solves; decimal sums of the
    // double products, same Cramer dag
    "q_als_item" ->
      s"""WITH uf AS ($AlsUserOracle),
         |${Ratings.OracleDedupCte},
         |j AS (
         |  SELECT r.item_id, r.rating, uf.x1, uf.x2
         |  FROM ratings r JOIN uf ON uf.user_id = r.user_id
         |), s AS (
         |  SELECT item_id, count(*) AS n_users,
         |    sum(CAST(x1 * x1 AS DECIMAL(38,12))) AS s11,
         |    sum(CAST(x1 * x2 AS DECIMAL(38,12))) AS s12,
         |    sum(CAST(x2 * x2 AS DECIMAL(38,12))) AS s22,
         |    sum(CAST(rating * x1 AS DECIMAL(38,12))) AS t1,
         |    sum(CAST(rating * x2 AS DECIMAL(38,12))) AS t2
         |  FROM j GROUP BY item_id
         |), m AS (
         |  SELECT item_id, n_users,
         |         CAST(s11 AS DOUBLE) + 0.1 AS a11, CAST(s12 AS DOUBLE) AS a12,
         |         CAST(s22 AS DOUBLE) + 0.1 AS a22,
         |         CAST(t1 AS DOUBLE) AS b1, CAST(t2 AS DOUBLE) AS b2
         |  FROM s
         |)
         |SELECT item_id, n_users,
         |       round((a22 * b1 - a12 * b2) / (a11 * a22 - a12 * a12), 6) + 0.0 AS y1,
         |       round((a11 * b2 - a12 * b1) / (a11 * a22 - a12 * a12), 6) + 0.0 AS y2
         |FROM m ORDER BY item_id""".stripMargin,
    "q_cf_recommend" ->
      s"""WITH ${Ratings.OracleDedupCte},
         |$CfCte,
         |cand AS (
         |  SELECT r2.user_id, n.t_item,
         |         CAST(sum(CAST(r2.rating * n.sim AS DECIMAL(30,15))) AS DOUBLE)
         |           / CAST(sum(CAST(n.sim AS DECIMAL(30,15))) AS DOUBLE) AS wavg,
         |         count(*) AS n_nbrs
         |  FROM r2 JOIN nbrs n ON r2.item_id = n.item_id
         |  GROUP BY r2.user_id, n.t_item
         |), own AS (
         |  SELECT user_id, item_id AS t_item, rating FROM r2 WHERE item_id IN (3, 7)
         |)
         |SELECT c.t_item, c.user_id, round(coalesce(CAST(o.rating AS DOUBLE), c.wavg), 4) AS pred
         |FROM cand c LEFT JOIN own o ON o.user_id = c.user_id AND o.t_item = c.t_item
         |WHERE c.n_nbrs >= 2 AND coalesce(CAST(o.rating AS DOUBLE), c.wavg) > 0
         |ORDER BY c.t_item, c.user_id""".stripMargin,
    "q_exact_dedup" ->
      """SELECT min(doc_id) AS rep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY rep_doc_id""".stripMargin,
    "q_neardup_minhash" ->
      s"""WITH ${ShingleCte("documents")}
         |SELECT co.da, co.db,
         |       round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 6) AS jac
         |FROM co JOIN sz x ON x.doc_id = co.da JOIN sz y ON y.doc_id = co.db
         |WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= 0.8
         |ORDER BY co.da, co.db""".stripMargin,
    // the exact ≥0.8 pair set restricted to pairs touching the mod-7
    // new batch — LSH equality on the gate corpora is the recall proof
    "q_incr_neardup" ->
      s"""WITH ${ShingleCte("documents")}
         |SELECT co.da, co.db,
         |       round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 6) AS jac
         |FROM co JOIN sz x ON x.doc_id = co.da JOIN sz y ON y.doc_id = co.db
         |WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= 0.8
         |  AND (co.da % 7 = 0 OR co.db % 7 = 0)
         |ORDER BY co.da, co.db""".stripMargin,
    // transitive closure of the exact ≥0.8 pair graph via recursive CTE
    // (min reachable id per node = component representative)
    "q_neardup_clusters" ->
      s"""WITH RECURSIVE ${ShingleCte("documents")},
         |pr AS (
         |  SELECT co.da, co.db
         |  FROM co JOIN sz x ON x.doc_id = co.da JOIN sz y ON y.doc_id = co.db
         |  WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= 0.8
         |), ed AS (
         |  SELECT da AS src, db AS dst FROM pr
         |  UNION ALL
         |  SELECT db, da FROM pr
         |), reach(node, label) AS (
         |  SELECT src, src FROM ed
         |  UNION
         |  SELECT e.src, r.label FROM ed e JOIN reach r ON r.node = e.dst
         |)
         |SELECT node AS doc_id, min(label) AS cluster
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,
    // exact new×old cross pairs (XOR on the mod-7 membership): the
    // streaming path's scope excludes new-new by design
    "q_stream_incr_neardup" ->
      s"""WITH ${ShingleCte("documents")}
         |SELECT co.da, co.db,
         |       round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 6) AS jac
         |FROM co JOIN sz x ON x.doc_id = co.da JOIN sz y ON y.doc_id = co.db
         |WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= 0.8
         |  AND ((co.da % 7 = 0) <> (co.db % 7 = 0))
         |ORDER BY co.da, co.db""".stripMargin,
    // identical by construction to q_neardup_clusters' oracle: the
    // incremental maintenance path must reproduce the from-scratch
    // clustering bit for bit
    "q_incr_clusters" ->
      s"""WITH RECURSIVE ${ShingleCte("documents")},
         |pr AS (
         |  SELECT co.da, co.db
         |  FROM co JOIN sz x ON x.doc_id = co.da JOIN sz y ON y.doc_id = co.db
         |  WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= 0.8
         |), ed AS (
         |  SELECT da AS src, db AS dst FROM pr
         |  UNION ALL
         |  SELECT db, da FROM pr
         |), reach(node, label) AS (
         |  SELECT src, src FROM ed
         |  UNION
         |  SELECT e.src, r.label FROM ed e JOIN reach r ON r.node = e.dst
         |)
         |SELECT node AS doc_id, min(label) AS cluster
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,
    // canonical docs: closure + keep-longest rank + singleton union —
    // the engine's three gated stages replayed as one oracle chain
    "q_canonical_docs" ->
      s"""WITH RECURSIVE ${ShingleCte("documents")},
         |pr AS (
         |  SELECT co.da, co.db
         |  FROM co JOIN sz x ON x.doc_id = co.da JOIN sz y ON y.doc_id = co.db
         |  WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= 0.8
         |), ed AS (
         |  SELECT da AS src, db AS dst FROM pr
         |  UNION ALL
         |  SELECT db, da FROM pr
         |), reach(node, label) AS (
         |  SELECT src, src FROM ed
         |  UNION
         |  SELECT e.src, r.label FROM ed e JOIN reach r ON r.node = e.dst
         |), cl AS (
         |  SELECT node AS doc_id, min(label) AS cluster
         |  FROM reach GROUP BY node
         |), tl AS (
         |  SELECT doc_id,
         |         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
         |  FROM documents
         |), rk AS (
         |  SELECT cl.doc_id, cl.cluster,
         |         row_number() OVER (PARTITION BY cluster
         |                            ORDER BY n_tokens DESC, cl.doc_id) AS rk,
         |         count(*) OVER (PARTITION BY cluster) AS n_members
         |  FROM cl JOIN tl ON tl.doc_id = cl.doc_id
         |)
         |SELECT doc_id, cluster, n_members FROM rk WHERE rk = 1
         |UNION ALL
         |SELECT d.doc_id, d.doc_id, 1 FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM cl)
         |ORDER BY doc_id""".stripMargin,
    // exact all-pairs at the q_neardup_ref threshold — recall gate for
    // the published r=18/b=28 banding
    "q_neardup_ref" ->
      s"""WITH ${ShingleCte("documents")}
         |SELECT co.da, co.db,
         |       round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 6) AS jac
         |FROM co JOIN sz x ON x.doc_id = co.da JOIN sz y ON y.doc_id = co.db
         |WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= 0.92
         |ORDER BY co.da, co.db""".stripMargin,
    // mirrors the engine's df cap (maxShingleDf = 1000): shingles shared
    // by more docs are dropped from the INTERSECTION (not the set sizes)
    // on both sides — the cap never binds at the driver gate SFs (their
    // corpora stay under df 1000) and binds hard on closed-vocab
    // saturated corpora (sf1 audit: most shingles exceed it)
    "q_ngram_jaccard" ->
      s"""WITH ${ShingleCte("documents")},
         |dfc AS (
         |  SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000
         |), coc AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
         |  FROM sh a JOIN dfc USING (s) JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id
         |)
         |SELECT coc.da, coc.db,
         |       round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 6) AS jac
         |FROM coc JOIN sz x ON x.doc_id = coc.da JOIN sz y ON y.doc_id = coc.db
         |WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= 0.5
         |ORDER BY coc.da, coc.db""".stripMargin,
    // same inverted index, overlap-coefficient score; mirrors the
    // engine's df cap exactly as q_ngram_jaccard does
    "q_overlap_pairs" ->
      s"""WITH ${ShingleCte("documents")},
         |dfc AS (
         |  SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000
         |), coc AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
         |  FROM sh a JOIN dfc USING (s) JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id
         |)
         |SELECT coc.da, coc.db,
         |       round(CAST(inter AS DOUBLE) / least(x.n, y.n), 6) AS ovl
         |FROM coc JOIN sz x ON x.doc_id = coc.da JOIN sz y ON y.doc_id = coc.db
         |WHERE CAST(inter AS DOUBLE) / least(x.n, y.n) >= 0.8
         |ORDER BY coc.da, coc.db""".stripMargin,
    "q_simhash" -> SimhashOracle,
    "q_simhash_pairs" -> SimhashPairsOracle,
    // identical by construction: the SQL-registered kernel must agree
    // with the DataFrame path bit for bit
    "q_sql_simhash" -> SimhashOracle,
    // NFC parity: DuckDB's nfc_normalize replays the JDK normalizer;
    // byte counts via strlen (bytes on both engines — character-length
    // functions disagree on combining sequences)
    "q_normalize_text" ->
      """WITH t AS (
        |  SELECT doc_id, text || ' cafe' || chr(769) || ' ' || chr(8491) AS raw
        |  FROM documents
        |)
        |SELECT doc_id,
        |       strlen(raw) AS n_raw_bytes,
        |       strlen(nfc_normalize(raw)) AS n_norm_bytes,
        |       md5(nfc_normalize(raw)) AS norm_md5
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_cosine_nn" ->
      s"""WITH $CosineCte,
         |dots AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS nn_id, ${DotSql("q", "c")} AS dot
         |  FROM v q JOIN v c ON c.vec_id <> q.vec_id, range(64) r(d)
         |  WHERE q.vec_id < 10
         |  GROUP BY q.vec_id, c.vec_id
         |), sims AS (
         |  SELECT d.q_id, d.nn_id, d.dot / (nq.nrm * nc.nrm) AS sim
         |  FROM dots d JOIN nrm nq ON nq.vec_id = d.q_id
         |  JOIN nrm nc ON nc.vec_id = d.nn_id
         |)
         |SELECT q_id, nn_id, round(sim, 6) AS sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |                               ORDER BY sim DESC, nn_id) AS rank
         |  FROM sims) x
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    // JL replay: same md5 signs, decimal sums, exact 0.25 scale;
    // the bound check recomputes on the raw ratio
    "q_jl_project" ->
      """WITH signs AS MATERIALIZED (
        |  SELECT j, d, CASE WHEN substr(md5(CAST(j AS VARCHAR) || '_' || CAST(d AS VARCHAR)), 1, 1) <= '7'
        |               THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS s
        |  FROM range(64) a(j), range(16) b(d)
        |), p AS MATERIALIZED (
        |  SELECT e.vec_id, s.d,
        |         CAST(sum(CAST(s.s * CAST(e.embedding[s.j + 1] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) * 0.25 AS p
        |  FROM embeddings e, signs s
        |  GROUP BY e.vec_id, s.d
        |), d2o AS (
        |  SELECT a.vec_id AS va,
        |         CAST(sum(CAST((CAST(a.embedding[i+1] AS DOUBLE) - CAST(b.embedding[i+1] AS DOUBLE))
        |              * (CAST(a.embedding[i+1] AS DOUBLE) - CAST(b.embedding[i+1] AS DOUBLE)) AS DECIMAL(38,18))) AS DOUBLE) AS d2o
        |  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0,
        |       range(64) r(i)
        |  GROUP BY a.vec_id
        |), d2p AS (
        |  SELECT pa.vec_id AS va,
        |         CAST(sum(CAST((pa.p - pb.p) * (pa.p - pb.p) AS DECIMAL(38,18))) AS DOUBLE) AS d2p
        |  FROM p pa JOIN p pb ON pb.vec_id = pa.vec_id + 1 AND pa.d = pb.d AND pa.vec_id % 2 = 0
        |  GROUP BY pa.vec_id
        |)
        |SELECT d2o.va, d2o.va + 1 AS vb, round(d2p.d2p, 6) AS d2p,
        |       round(d2o.d2o, 6) AS d2o,
        |       round(CASE WHEN d2o.d2o <> 0.0 THEN d2p.d2p / d2o.d2o END, 6) AS ratio,
        |       CASE WHEN d2o.d2o <> 0.0
        |            THEN d2p.d2p / d2o.d2o >= 0.15 AND d2p.d2p / d2o.d2o <= 3.0 END AS within_bound
        |FROM d2o JOIN d2p USING (va) ORDER BY va""".stripMargin,
    // mutual-kNN replay: symmetric sims computed once (a<b), ranked
    // from both endpoints, mutual edges via the two-sided rank join
    "q_knn_graph" ->
      s"""WITH $CosineCte,
         |dots AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb, ${DotSql("a", "b")} AS dot
         |  FROM v a JOIN v b ON a.vec_id < b.vec_id, range(64) r(d)
         |  GROUP BY a.vec_id, b.vec_id
         |), sims AS (
         |  SELECT d.va, d.vb, d.dot / (na.nrm * nb.nrm) AS sim
         |  FROM dots d JOIN nrm na ON na.vec_id = d.va
         |  JOIN nrm nb ON nb.vec_id = d.vb
         |), bi AS (
         |  SELECT va AS q, vb AS n, sim FROM sims
         |  UNION ALL SELECT vb, va, sim FROM sims
         |), rk AS (
         |  SELECT q, n, sim, row_number() OVER (PARTITION BY q
         |                                       ORDER BY sim DESC, n) AS rank
         |  FROM bi
         |), e1 AS (
         |  SELECT q AS va, n AS vb, round(sim, 6) AS sim, rank AS rank_ab
         |  FROM rk WHERE rank <= 5 AND q < n
         |), e2 AS (
         |  SELECT n AS va, q AS vb, rank AS rank_ba
         |  FROM rk WHERE rank <= 5 AND q > n
         |)
         |SELECT va, vb, sim, rank_ab, rank_ba
         |FROM e1 JOIN e2 USING (va, vb) ORDER BY va, vb""".stripMargin,
    // RRF: cosine and L2 rankings replayed with decimal-exact scores,
    // fused with the same 1/(60+rank) terms; rrf raw-double
    "q_rrf_fusion" ->
      s"""WITH $CosineCte,
         |dots AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS nn_id, ${DotSql("q", "c")} AS dot
         |  FROM v q JOIN v c ON c.vec_id <> q.vec_id, range(64) r(d)
         |  WHERE q.vec_id < 10
         |  GROUP BY q.vec_id, c.vec_id
         |), s2 AS (
         |  SELECT vec_id, CAST(sum(CAST(CAST(embedding[d+1] AS DOUBLE)
         |         * CAST(embedding[d+1] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS sq
         |  FROM v, range(64) r(d) GROUP BY vec_id
         |), crank AS (
         |  SELECT q_id, nn_id, row_number() OVER (PARTITION BY q_id
         |           ORDER BY sim DESC, nn_id) AS rank FROM (
         |    SELECT d.q_id, d.nn_id, d.dot / (nq.nrm * nc.nrm) AS sim
         |    FROM dots d JOIN nrm nq ON nq.vec_id = d.q_id
         |    JOIN nrm nc ON nc.vec_id = d.nn_id)
         |), lrank AS (
         |  SELECT q_id, nn_id, row_number() OVER (PARTITION BY q_id
         |           ORDER BY sim DESC, nn_id) AS rank FROM (
         |    SELECT d.q_id, d.nn_id, -(q.sq - 2.0 * d.dot + c.sq) AS sim
         |    FROM dots d JOIN s2 q ON q.vec_id = d.q_id
         |    JOIN s2 c ON c.vec_id = d.nn_id)
         |), u AS (
         |  SELECT * FROM crank WHERE rank <= 10
         |  UNION ALL SELECT * FROM lrank WHERE rank <= 10
         |), f AS (
         |  SELECT q_id, nn_id,
         |         sum(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + rank)) AS rrf,
         |         count(*) AS n_rankers
         |  FROM u GROUP BY q_id, nn_id
         |)
         |SELECT q_id, nn_id, rrf, n_rankers, fused_rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |           ORDER BY rrf DESC, nn_id) AS fused_rank FROM f) x
         |WHERE fused_rank <= 10 ORDER BY q_id, fused_rank""".stripMargin,
    "q_curation" ->
      s"""WITH ${ShingleCte("documents")},
         |nd AS (
         |  SELECT DISTINCT co.db AS doc_id
         |  FROM co JOIN sz x ON x.doc_id = co.da JOIN sz y ON y.doc_id = co.db
         |  WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= 0.8
         |), reps AS (
         |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
         |), $QualityCte,
         |$LangCtes
         |SELECT d.doc_id, round(qf.score, 6) AS score,
         |       coalesce(b.lang, 'und') AS lang_pred
         |FROM documents d
         |JOIN reps USING (doc_id)
         |LEFT JOIN nd ON nd.doc_id = d.doc_id
         |JOIN qf ON qf.doc_id = d.doc_id
         |LEFT JOIN best b ON b.doc_id = d.doc_id
         |WHERE nd.doc_id IS NULL AND qf.score >= 0.5
         |ORDER BY d.doc_id""".stripMargin,
    "q_curation_sample" ->
      s"""WITH ${ShingleCte("documents")},
         |nd AS (
         |  SELECT DISTINCT co.db AS doc_id
         |  FROM co JOIN sz x ON x.doc_id = co.da JOIN sz y ON y.doc_id = co.db
         |  WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= 0.8
         |), reps AS (
         |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
         |), $QualityCte,
         |$LangCtes,
         |survivors AS (
         |  SELECT d.doc_id, round(qf.score, 6) AS score,
         |         coalesce(b.lang, 'und') AS lang_pred
         |  FROM documents d
         |  JOIN reps USING (doc_id)
         |  LEFT JOIN nd ON nd.doc_id = d.doc_id
         |  JOIN qf ON qf.doc_id = d.doc_id
         |  LEFT JOIN best b ON b.doc_id = d.doc_id
         |  WHERE nd.doc_id IS NULL AND qf.score >= 0.5
         |)
         |SELECT doc_id, score, lang_pred FROM (
         |  SELECT * FROM survivors
         |  ORDER BY md5(CAST(doc_id AS VARCHAR) || '|train') LIMIT 100
         |) t ORDER BY doc_id""".stripMargin,
    // A-ES weighted sample: identical log-space sort key, identical
    // open-interval uniform (hash24 + 0.5), identical rounding/tiebreak
    "q_weighted_sample" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT * FROM documents
        |  ORDER BY round(ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|mix'), 1, 6))::BIGINT + 0.5)
        |                    / 16777216.0) / n_chars, 9) DESC, doc_id
        |  LIMIT 30
        |) t ORDER BY doc_id""".stripMargin,
    "q_stratified_weighted" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT *, row_number() OVER (PARTITION BY lang
        |    ORDER BY round(ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|mixstrat'), 1, 6))::BIGINT + 0.5)
        |                      / 16777216.0) / n_chars, 9) DESC, doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 20 ORDER BY lang, doc_id""".stripMargin,
    // floor(x + 0.5) half-up on both engines — no banker's-rounding
    // divergence; sum cast back to BIGINT (DuckDB sums BIGINT→HUGEINT)
    "q_quantize" ->
      """WITH v AS (SELECT vec_id, embedding FROM embeddings),
        |el AS (
        |  SELECT vec_id, d, CAST(embedding[d+1] AS DOUBLE) AS x
        |  FROM v, range(64) r(d)
        |), sc AS (
        |  SELECT vec_id, max(abs(x)) AS scale FROM el GROUP BY vec_id
        |), qq AS (
        |  SELECT el.vec_id, sc.scale, x,
        |         CASE WHEN sc.scale = 0 THEN 0
        |              ELSE CAST(floor(x * 127.0 / sc.scale + 0.5) AS BIGINT) END AS q
        |  FROM el JOIN sc USING (vec_id)
        |)
        |SELECT vec_id, round(scale, 6) AS scale,
        |       CAST(sum(q) AS BIGINT) AS sum_q,
        |       round(max(abs(q * scale / 127.0 - x)), 6) AS max_abs_err
        |FROM qq GROUP BY vec_id, scale ORDER BY vec_id""".stripMargin,
    "q_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
        |), ok AS (
        |  SELECT doc_id, ws FROM toks WHERE len(ws) >= 2
        |), tc AS (
        |  SELECT doc_id, w, count(*) AS c
        |  FROM (SELECT doc_id, unnest(ws) AS w FROM ok) x GROUP BY doc_id, w
        |), top AS (
        |  SELECT doc_id, max(c) AS top_c FROM tc GROUP BY doc_id
        |), tg AS (
        |  SELECT doc_id, any_value(len(ws)) AS n_tokens,
        |         count(DISTINCT ws[i+1] || ' ' || ws[i+2]) AS d2
        |  FROM ok JOIN range(2000) t(i) ON i + 2 <= len(ws)
        |  GROUP BY doc_id
        |)
        |SELECT g.doc_id, g.n_tokens,
        |       round(top_c * 1.0 / n_tokens, 6) AS top_token_frac,
        |       round(1.0 - d2 * 1.0 / (n_tokens - 1), 6) AS dup_2gram_frac,
        |       (top_c * 1.0 / n_tokens <= 0.12
        |        AND 1.0 - d2 * 1.0 / (n_tokens - 1) <= 0.06) AS keep
        |FROM tg g JOIN top USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s
        |  FROM toks JOIN range(2000) t(i) ON i + 3 <= len(ws)
        |), sz AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), co AS (
        |  SELECT a.doc_id AS train_id, b.doc_id AS eval_id, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id % 7 <> 0 AND b.doc_id % 7 = 0
        |  GROUP BY a.doc_id, b.doc_id
        |)
        |SELECT co.train_id, co.eval_id,
        |       round(CAST(inter AS DOUBLE) / x.n, 6) AS frac
        |FROM co JOIN sz x ON x.doc_id = co.train_id
        |WHERE CAST(inter AS DOUBLE) / x.n >= 0.3
        |ORDER BY train_id, eval_id""".stripMargin,
    // string-side recomputation of the window postings: i*16+32 ≤ len
    // selects exactly the engine's positions 0..⌊(len−32)/16⌋
    "q_substring_dups" ->
      """WITH el AS (
        |  SELECT doc_id, text FROM documents WHERE length(text) >= 32
        |), win AS (
        |  SELECT DISTINCT doc_id, substring(text, 1 + 16*i, 32) AS s
        |  FROM el JOIN range(64) t(i) ON 16*i + 32 <= length(text)
        |), dfreq AS (
        |  SELECT s, count(*) AS df FROM win GROUP BY s
        |)
        |SELECT doc_id, count(*) AS n_windows,
        |       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |       round(CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 6) AS shared_frac
        |FROM win JOIN dfreq USING (s)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    // same tokenize+shingle construction as the dedup oracles at n=2;
    // df over distinct per-doc bigrams, rarity decided on exact ints
    "q_rare_bigrams" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, ws[i+1] || ' ' || ws[i+2] AS s
        |  FROM toks JOIN range(2000) t(i) ON i + 2 <= len(ws)
        |), dfreq AS (
        |  SELECT s, count(*) AS df FROM sh GROUP BY s
        |)
        |SELECT doc_id, count(*) AS n_bigrams,
        |       CAST(sum(CASE WHEN df <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        |       round(CAST(sum(CASE WHEN df <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 6) AS rare_frac,
        |       (CAST(sum(CASE WHEN df <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*)) <= 0.4 AS keep
        |FROM sh JOIN dfreq USING (s)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    // collocations: adjacency via 1-based list indexing over
    // generate_series (empty when a doc has <2 tokens); lift in
    // all-BIGINT arithmetic with floor division — exact on both engines
    "q_colloc" ->
      """WITH toks AS (
        |  SELECT regexp_extract_all(lower(text), '((?:[\.,!?;"])|(?:(?:\#|\@)?[A-Za-z0-9_\-]+(?:''[a-z]{1,3})?))', 1) AS t
        |  FROM documents
        |), flat AS (SELECT unnest(t) AS word FROM toks),
        |uni AS (SELECT word, count(*) AS c FROM flat GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM flat),
        |big AS (
        |  SELECT t[i] AS w1, t[i+1] AS w2, count(*) AS cxy
        |  FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
        |  GROUP BY 1, 2
        |)
        |SELECT w1, w2, cxy, (cxy * 1000000 * tot.n) // (u1.c * u2.c) AS lift_ppm
        |FROM big CROSS JOIN tot
        |JOIN uni u1 ON u1.word = w1
        |JOIN uni u2 ON u2.word = w2
        |WHERE cxy >= 5
        |ORDER BY lift_ppm DESC, w1, w2 LIMIT 50""".stripMargin,
    // bigram LM: same tokenizer as the dedup family; unigram counts
    // over ALL positions, V = distinct vocab, add-one smoothing. NLL
    // term = ln((c1+V)/(c2+1)) rounded 9, decimal-summed, avg at 6 dp;
    // keep on the published value (mirrors TextOps.bigramNll exactly)
    "q_lm_nll" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
         |  FROM documents
         |), big AS (
         |  SELECT doc_id, ws[i+1] AS w1, ws[i+2] AS w2
         |  FROM toks JOIN range(2000) t(i) ON i + 2 <= len(ws)
         |), uni AS (
         |  SELECT unnest(ws) AS w FROM toks
         |), c2 AS (
         |  SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2
         |), c1 AS (
         |  SELECT w AS w1, count(*) AS c1 FROM uni GROUP BY w
         |), v AS (SELECT count(DISTINCT w) AS v FROM uni),
         |terms AS (
         |  SELECT doc_id,
         |         round(ln(CAST(c1.c1 + v.v AS DOUBLE) / (c2.c2 + 1)), 9) AS nll
         |  FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v
         |)
         |SELECT doc_id, n_bigrams, avg_nll, avg_nll <= $LmKeepBelow AS keep FROM (
         |  SELECT doc_id, count(*) AS n_bigrams,
         |         round(CAST(sum(CAST(nll AS DECIMAL(28,12))) AS DOUBLE)
         |               / count(*), 6) AS avg_nll
         |  FROM terms GROUP BY doc_id)
         |ORDER BY doc_id""".stripMargin,
    // token-presence × language MI: exact-count ratios, 9-dp ln
    // terms (one double division of int64 products), decimal sums
    "q_mi_tokens" ->
      """WITH ws AS (
        |  SELECT lang AS label,
        |         list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS ws
        |  FROM documents
        |), pres AS (SELECT label, unnest(ws) AS token FROM ws),
        |a AS (SELECT token, label, count(*) AS a FROM pres GROUP BY 1, 2),
        |ta AS (SELECT token, sum(a) AS ta FROM a GROUP BY 1),
        |nc AS (SELECT lang AS label, count(*) AS nc FROM documents GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |grid AS (
        |  SELECT t.token, c.label, coalesce(a.a, 0) AS a, t.ta, c.nc, n.n
        |  FROM ta t CROSS JOIN nc c CROSS JOIN n
        |  LEFT JOIN a ON a.token = t.token AND a.label = c.label
        |), terms AS (
        |  SELECT token,
        |    CASE WHEN a > 0
        |         THEN round((CAST(a AS DOUBLE) / n)
        |              * ln(CAST(a * n AS DOUBLE) / (ta * nc)), 9)
        |         ELSE 0.0 END AS t1,
        |    CASE WHEN nc - a > 0
        |         THEN round((CAST(nc - a AS DOUBLE) / n)
        |              * ln(CAST((nc - a) * n AS DOUBLE) / ((n - ta) * nc)), 9)
        |         ELSE 0.0 END AS t0
        |  FROM grid
        |)
        |SELECT token,
        |       round(CAST(sum(CAST(t1 AS DECIMAL(28,12))
        |                      + CAST(t0 AS DECIMAL(28,12))) AS DOUBLE), 6) AS mi
        |FROM terms GROUP BY token
        |ORDER BY mi DESC, token LIMIT 30""".stripMargin,
    // windowed co-occurrence + PPMI: pairs from the positional arrays
    // (offsets 1..3), marginals from the pair table itself, single
    // 9-dp ln term clamped at 0
    "q_cooccur" ->
      """WITH toks AS (
        |  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
        |), big AS (
        |  SELECT least(ws[i], ws[i + d]) AS w1, greatest(ws[i], ws[i + d]) AS w2
        |  FROM toks,
        |       LATERAL unnest(generate_series(1, len(ws) - 1)) g(i),
        |       LATERAL unnest(generate_series(1, 3)) dd(d)
        |  WHERE i + d <= len(ws)
        |), cab AS (SELECT w1, w2, count(*) AS n_ab FROM big GROUP BY 1, 2),
        |tot AS (SELECT sum(n_ab) AS t FROM cab),
        |marg AS (
        |  SELECT w, sum(n_ab) AS m FROM (
        |    SELECT w1 AS w, n_ab FROM cab
        |    UNION ALL SELECT w2, n_ab FROM cab) GROUP BY w
        |)
        |SELECT w1, w2, n_ab,
        |       round(greatest(0.0,
        |         round(ln(CAST(n_ab * tot.t AS DOUBLE) / (m1.m * m2.m)), 9)), 6) AS ppmi
        |FROM cab CROSS JOIN tot
        |JOIN marg m1 ON m1.w = w1
        |JOIN marg m2 ON m2.w = w2
        |WHERE n_ab >= 5
        |ORDER BY w1, w2""".stripMargin,
    // TextRank replay: same pair graph, exact-int edge fractions,
    // unrolled damped rounds on the 9-dp/decimal-sum path
    "q_textrank" ->
      s"""WITH toks AS (
         |  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
         |), big AS (
         |  SELECT least(ws[i], ws[i + d]) AS w1, greatest(ws[i], ws[i + d]) AS w2
         |  FROM toks,
         |       LATERAL unnest(generate_series(1, len(ws) - 1)) g(i),
         |       LATERAL unnest(generate_series(1, 3)) dd(d)
         |  WHERE i + d <= len(ws)
         |), cab AS (
         |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM big GROUP BY 1, 2
         |  HAVING count(*) >= 5
         |), tred AS (
         |  SELECT w1 AS src, w2 AS dst, n FROM cab
         |  UNION ALL SELECT w2, w1, n FROM cab
         |), trws AS (
         |  SELECT src, CAST(sum(n) AS BIGINT) AS w_out FROM tred GROUP BY src
         |), tre AS MATERIALIZED (
         |  SELECT e.src, e.dst, CAST(e.n AS DOUBLE) / CAST(w.w_out AS DOUBLE) AS frac
         |  FROM tred e JOIN trws w ON w.src = e.src
         |), trnodes AS MATERIALIZED (SELECT src AS word, w_out FROM trws),
         |trcnt AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM trnodes),
         |tr0 AS MATERIALIZED (
         |  SELECT word,
         |    round(CAST(1 AS DOUBLE) / CAST((SELECT nn FROM trcnt) AS DOUBLE), 9) AS r
         |  FROM trnodes
         |),
         |${trRoundsSql(5)}
         |SELECT n.word, n.w_out, round(r.r, 6) AS rank
         |FROM trnodes n JOIN tr5 r USING (word) ORDER BY word""".stripMargin,
    // NB replay: same counts, same 9-dp ln terms, same decimal sums;
    // argmax by row_number over the exact decimal score
    "q_naive_bayes" -> NaiveBayesOracle,
    // per-class confusion over the same NB replay: one (t, p) agg +
    // class-sized marginals; DuckDB sums CAST to BIGINT
    "q_confusion" ->
      s"""WITH nb AS ($NaiveBayesOracle),
         |cm AS (SELECT true_label AS t, pred_label AS p, count(*) AS n
         |       FROM nb GROUP BY 1, 2),
         |bt AS (SELECT t, CAST(sum(n) AS BIGINT) AS support FROM cm GROUP BY t),
         |bp AS (SELECT p AS t, CAST(sum(n) AS BIGINT) AS npred FROM cm GROUP BY p),
         |dg AS (SELECT t, n AS tp0 FROM cm WHERE t = p),
         |j AS (
         |  SELECT bt.t, bt.support, CAST(coalesce(dg.tp0, 0) AS BIGINT) AS tp,
         |         bp.npred
         |  FROM bt LEFT JOIN dg USING (t) LEFT JOIN bp USING (t)
         |)
         |SELECT t AS label, support, tp,
         |       round(CAST(tp AS DOUBLE) / npred, 6) AS precision,
         |       round(CAST(tp AS DOUBLE) / support, 6) AS recall,
         |       CASE WHEN npred IS NULL THEN NULL
         |            WHEN CAST(tp AS DOUBLE) / npred + CAST(tp AS DOUBLE) / support > 0
         |            THEN round(2.0 * (CAST(tp AS DOUBLE) / npred)
         |                       * (CAST(tp AS DOUBLE) / support)
         |                       / (CAST(tp AS DOUBLE) / npred
         |                          + CAST(tp AS DOUBLE) / support), 6)
         |            ELSE 0.0 END AS f1
         |FROM j ORDER BY label""".stripMargin,
    // stump replay: same cumulative split table, same IEEE score dag
    "q_stump" ->
      """WITH byx AS (
        |  SELECT n_chars // 16 AS x, count(*) AS n,
        |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM documents GROUP BY 1
        |), cum AS (
        |  SELECT x AS split,
        |         CAST(sum(n) OVER w AS BIGINT) AS n_left,
        |         CAST(sum(pos) OVER w AS BIGINT) AS pos_left
        |  FROM byx WINDOW w AS (ORDER BY x ROWS UNBOUNDED PRECEDING)
        |), tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |                  CAST(sum(pos) AS BIGINT) AS pp FROM byx),
        |sc AS (
        |  SELECT split, n_left, pos_left,
        |         t.nn - n_left AS n_right, t.pp - pos_left AS pos_right,
        |         CAST(pos_left AS DOUBLE) * (n_left - pos_left) / n_left
        |           + CAST(t.pp - pos_left AS DOUBLE)
        |             * ((t.nn - n_left) - (t.pp - pos_left)) / (t.nn - n_left) AS s
        |  FROM cum CROSS JOIN tot t WHERE n_left < t.nn
        |)
        |SELECT split, n_left, pos_left, n_right, pos_right,
        |       round(s, 6) AS score,
        |       row_number() OVER (ORDER BY s, split) AS rank
        |FROM sc ORDER BY split""".stripMargin,
    // JSON field extraction via DuckDB's ->> operator; exact ints
    "q_json_props" ->
      """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |       min(k) AS min_k, max(k) AS max_k,
        |       count(DISTINCT k) AS n_distinct_k
        |FROM (SELECT event_type, CAST(props->>'k' AS BIGINT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // strict-order funnel: each step's first occurrence at-or-after the
    // previous step's resolution, left-chained; stage = resolved prefix
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS step1_us FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.us) AS step2_us
        |       FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND e.us >= s1.step1_us
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.us) AS step3_us
        |       FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND e.us >= s2.step2_us
        |       GROUP BY e.user_id)
        |SELECT s1.user_id, s1.step1_us, s2.step2_us, s3.step3_us,
        |       1 + CASE WHEN s2.step2_us IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN s3.step3_us IS NULL THEN 0 ELSE 1 END AS stage
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY s1.user_id""".stripMargin,
    // 7-day epoch-anchored cohorts; integer period arithmetic (// = div)
    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS p FROM events),
        |f AS (SELECT user_id, min(p) AS cohort FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, p FROM e),
        |r AS (SELECT f.cohort, a.p - f.cohort AS "offset", count(*) AS n_active
        |      FROM f JOIN a USING (user_id) GROUP BY 1, 2),
        |cs AS (SELECT cohort, count(*) AS cohort_size FROM f GROUP BY cohort)
        |SELECT r.cohort, r."offset", cs.cohort_size, r.n_active
        |FROM r JOIN cs USING (cohort) ORDER BY 1, 2""".stripMargin,
    // sketch certificates: the oracle contributes the exact side and a
    // literal TRUE -- hash equality proves the published error bound
    "q_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_n,
        |       TRUE AS within_bound
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_approx_quantile" ->
      """WITH g AS (SELECT event_type, count(*) AS n FROM events GROUP BY event_type)
        |SELECT g.event_type, q.q_idx, g.n, TRUE AS within_bound
        |FROM g CROSS JOIN (VALUES (0), (1), (2)) AS q(q_idx)
        |ORDER BY event_type, q_idx""".stripMargin,
    // UNBLOCKED all-pairs Levenshtein: equality = blocking completeness
    "q_editdist_pairs" ->
      """WITH k AS (SELECT doc_id, substr(text, 1, 16) AS k FROM documents)
        |SELECT least(a.doc_id, b.doc_id) AS id_a,
        |       greatest(a.doc_id, b.doc_id) AS id_b,
        |       CAST(levenshtein(a.k, b.k) AS INTEGER) AS dist
        |FROM k a JOIN k b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.k, b.k) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    // dimension marginals via GROUPING SETS; sentinels for rolled-up dims
    "q_grouping_sets" ->
      s"""SELECT coalesce(event_type, 'ALL') AS dim_type,
         |       coalesce(ub, -1) AS dim_bucket, count(*) AS n,
         |       ${decMeanSql("value")} AS mean_value
         |FROM (SELECT event_type, user_id % 4 AS ub, value FROM events)
         |GROUP BY GROUPING SETS ((event_type), (ub), ())
         |ORDER BY dim_type, dim_bucket""".stripMargin,
    // exact p05/p95 winsorized stats; quantile_cont = Spark percentile
    "q_winsorize" ->
      s"""WITH b AS (SELECT event_type,
         |             quantile_cont(value, 0.05) AS lo,
         |             quantile_cont(value, 0.95) AS hi
         |           FROM events GROUP BY event_type)
         |SELECT e.event_type, count(*) AS n,
         |       CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
         |       CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
         |       ${decMeanSql("value")} AS raw_mean,
         |       ${decMeanSql("least(greatest(value, lo), hi)")} AS wins_mean
         |FROM events e JOIN b USING (event_type)
         |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    // modified z (LOWER median/MAD — exact elements, so the whole chain
    // is deterministic IEEE arithmetic and the score publishes RAW:
    // round()ing is what diverges here — quantized inputs put the exact
    // ratio ON x.xxxx5 boundaries where the engines' rounding paths
    // disagree); flag from the published score vs the exact 3.5
    "q_robust_z" ->
      """WITH r AS (SELECT event_type, value,
        |             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |             count(*) OVER (PARTITION BY event_type) AS n
        |           FROM events),
        |m AS (SELECT event_type, value AS med FROM r WHERE rn = (n + 1) // 2),
        |r2 AS (SELECT e.event_type, abs(e.value - m.med) AS dev,
        |         row_number() OVER (PARTITION BY e.event_type
        |                            ORDER BY abs(e.value - m.med)) AS rn,
        |         count(*) OVER (PARTITION BY e.event_type) AS n
        |       FROM events e JOIN m USING (event_type)),
        |d0 AS (SELECT event_type, dev AS mad FROM r2 WHERE rn = (n + 1) // 2),
        |d AS (SELECT m.event_type, m.med, d0.mad FROM m JOIN d0 USING (event_type))
        |SELECT e.event_id, e.event_type,
        |       0.6745 * (e.value - d.med)
        |         / CASE WHEN d.mad > 0 THEN d.mad END AS z,
        |       abs(0.6745 * (e.value - d.med)
        |         / CASE WHEN d.mad > 0 THEN d.mad END) > 3.5 AS is_outlier
        |FROM events e JOIN d USING (event_type)
        |ORDER BY e.event_id""".stripMargin,
    // power-iteration PCA replayed as unrolled CTEs; full-double compare
    "q_pca_top" -> pcaOracleSql(dims = 64, iters = 5),
    // group-integrity split: same md5 draw, IEEE-identical thresholds
    // (bounds written as unfolded sums), computed leak certificate
    "q_group_split" ->
      """WITH s AS (
        |  SELECT user_id,
        |    CASE WHEN u < 0.8 THEN 0
        |         WHEN u < (0.8 + 0.1) THEN 1 ELSE 2 END AS split
        |  FROM (SELECT user_id,
        |          ('0x' || substring(md5(CAST(user_id AS VARCHAR) || '|split5'), 1, 6))::BIGINT
        |          / 16777216.0 AS u
        |        FROM events) t),
        |leak AS (SELECT max(ns) AS mx FROM (
        |  SELECT user_id, count(DISTINCT split) AS ns FROM s GROUP BY user_id) q)
        |SELECT split, count(*) AS n_rows, count(DISTINCT user_id) AS n_users,
        |       (SELECT mx FROM leak) = 1 AS leak_free
        |FROM s GROUP BY split ORDER BY split""".stripMargin,
    // unigram entropy: same tokenizer, (c/n)·ln(n/c) terms rounded 9,
    // decimal-summed; normalized form from the published entropy
    "q_token_entropy" ->
      """WITH counts AS (
        |  SELECT doc_id, w, count(*) AS c
        |  FROM (SELECT doc_id,
        |               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |        FROM documents)
        |  GROUP BY doc_id, w
        |), t AS (
        |  SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM counts
        |), terms AS (
        |  SELECT doc_id, n,
        |         round(CAST(c AS DOUBLE) / n * ln(CAST(n AS DOUBLE) / c), 9) AS term
        |  FROM t
        |), agg AS (
        |  SELECT doc_id, count(*) AS n_types, CAST(max(n) AS BIGINT) AS n_tokens,
        |         round(CAST(sum(CAST(term AS DECIMAL(28,12))) AS DOUBLE), 6) AS entropy
        |  FROM terms GROUP BY doc_id
        |)
        |SELECT doc_id, n_types, n_tokens, entropy,
        |       CASE WHEN n_types > 1
        |            THEN round(entropy / ln(CAST(n_types AS DOUBLE)), 6)
        |       END AS entropy_norm
        |FROM agg ORDER BY doc_id""".stripMargin,
    // Morton interleave mirrored bit by bit (sum over range(16) of the
    // even/odd-position bit contributions), then the same bucket aggs
    "q_zorder" ->
      """WITH pts AS (
        |  SELECT event_id, user_id, event_id % 65536 AS e16 FROM events
        |), zz AS (
        |  SELECT user_id, e16,
        |         CAST(sum((((user_id >> d) & 1) << (2*d))
        |                  + (((e16 >> d) & 1) << (2*d+1))) AS BIGINT) AS z
        |  FROM pts, range(16) r(d)
        |  GROUP BY event_id, user_id, e16
        |)
        |SELECT z >> 16 AS bucket, count(*) AS n,
        |       min(user_id) AS u_min, max(user_id) AS u_max,
        |       min(e16) AS e_min, max(e16) AS e_max
        |FROM zz GROUP BY 1 ORDER BY 1""".stripMargin,
    // stupid-backoff trigram LM on the mod-5 held-out split; branch
    // selection on exact integers, NLL literal shape mirrored from
    // TextOps.trigramBackoffNll term for term (0.4 parses to the same
    // double in both engines; left-to-right association preserved)
    "q_lm_backoff" ->
      """WITH tr AS (
        |  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        |  FROM documents WHERE doc_id % 5 <> 0
        |), ev AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        |  FROM documents WHERE doc_id % 5 = 0
        |), c3 AS (
        |  SELECT ws[i+1] AS w1, ws[i+2] AS w2, ws[i+3] AS w3, count(*) AS c3
        |  FROM tr JOIN range(2000) t(i) ON i + 3 <= len(ws)
        |  GROUP BY 1, 2, 3
        |), c2 AS (
        |  SELECT ws[i+1] AS wa, ws[i+2] AS wb, count(*) AS c2
        |  FROM tr JOIN range(2000) t(i) ON i + 2 <= len(ws)
        |  GROUP BY 1, 2
        |), c1 AS (
        |  SELECT w, count(*) AS c1 FROM (SELECT unnest(ws) AS w FROM tr)
        |  GROUP BY w
        |), tv AS (
        |  SELECT count(*) AS t, count(DISTINCT w) AS v
        |  FROM (SELECT unnest(ws) AS w FROM tr)
        |), tri AS (
        |  SELECT doc_id, ws[i+1] AS w1, ws[i+2] AS w2, ws[i+3] AS w3
        |  FROM ev JOIN range(2000) t(i) ON i + 3 <= len(ws)
        |), scored AS (
        |  SELECT tri.doc_id,
        |         CASE WHEN coalesce(c3.c3, 0) > 0 AND coalesce(h.c2, 0) > 0 THEN 3
        |              WHEN coalesce(b.c2, 0) > 0 AND coalesce(u2.c1, 0) > 0 THEN 2
        |              ELSE 1 END AS branch,
        |         CASE WHEN coalesce(c3.c3, 0) > 0 AND coalesce(h.c2, 0) > 0
        |              THEN round(-ln(CAST(c3.c3 AS DOUBLE) / h.c2), 9)
        |              WHEN coalesce(b.c2, 0) > 0 AND coalesce(u2.c1, 0) > 0
        |              THEN round(-ln(0.4 * b.c2 / u2.c1), 9)
        |              ELSE round(-ln(0.4 * 0.4 * (coalesce(u3.c1, 0) + 1)
        |                            / (tv.t + tv.v)), 9) END AS nll
        |  FROM tri
        |  LEFT JOIN c3 ON c3.w1 = tri.w1 AND c3.w2 = tri.w2 AND c3.w3 = tri.w3
        |  LEFT JOIN c2 h ON h.wa = tri.w1 AND h.wb = tri.w2
        |  LEFT JOIN c2 b ON b.wa = tri.w2 AND b.wb = tri.w3
        |  LEFT JOIN c1 u2 ON u2.w = tri.w2
        |  LEFT JOIN c1 u3 ON u3.w = tri.w3
        |  CROSS JOIN tv
        |)
        |SELECT doc_id, count(*) AS n_trigrams,
        |       CAST(sum(CASE WHEN branch = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri_hits,
        |       CAST(sum(CASE WHEN branch = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bi_hits,
        |       CAST(sum(CASE WHEN branch = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_uni_hits,
        |       round(CAST(sum(CAST(nll AS DECIMAL(28,12))) AS DOUBLE)
        |             / count(*), 6) AS avg_nll
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // PageRank, 5 unrolled scatter/gather rounds in scaled-integer
    // arithmetic: R_{k+1} = 9*60^k + 17*sum(in-edge R_k), R_0 = 1 —
    // rank = R_5 / (N * 60^5). Same synthetic fixed-outdeg-3 graph as
    // GraphOps.syntheticEdges; every value BIGINT until the last divide
    "q_pagerank" ->
      """WITH p AS (SELECT count(*) AS n FROM documents),
        |e AS (
        |  SELECT doc_id AS src, (doc_id + 1) % n AS dst FROM documents, p
        |  UNION ALL SELECT doc_id, (doc_id * 2 + 3) % n FROM documents, p
        |  UNION ALL SELECT doc_id, (doc_id * doc_id + 5) % n FROM documents, p
        |),
        |r0 AS (SELECT doc_id AS node, CAST(1 AS BIGINT) AS r FROM documents),
        |s1 AS (SELECT e.dst AS node, sum(r.r) AS s FROM e JOIN r0 r ON r.node = e.src GROUP BY e.dst),
        |r1 AS (SELECT r0.node, CAST(9 + 17 * coalesce(s1.s, 0) AS BIGINT) AS r FROM r0 LEFT JOIN s1 USING (node)),
        |s2 AS (SELECT e.dst AS node, sum(r.r) AS s FROM e JOIN r1 r ON r.node = e.src GROUP BY e.dst),
        |r2 AS (SELECT r1.node, CAST(540 + 17 * coalesce(s2.s, 0) AS BIGINT) AS r FROM r1 LEFT JOIN s2 USING (node)),
        |s3 AS (SELECT e.dst AS node, sum(r.r) AS s FROM e JOIN r2 r ON r.node = e.src GROUP BY e.dst),
        |r3 AS (SELECT r2.node, CAST(32400 + 17 * coalesce(s3.s, 0) AS BIGINT) AS r FROM r2 LEFT JOIN s3 USING (node)),
        |s4 AS (SELECT e.dst AS node, sum(r.r) AS s FROM e JOIN r3 r ON r.node = e.src GROUP BY e.dst),
        |r4 AS (SELECT r3.node, CAST(1944000 + 17 * coalesce(s4.s, 0) AS BIGINT) AS r FROM r3 LEFT JOIN s4 USING (node)),
        |s5 AS (SELECT e.dst AS node, sum(r.r) AS s FROM e JOIN r4 r ON r.node = e.src GROUP BY e.dst),
        |r5 AS (SELECT r4.node, CAST(116640000 + 17 * coalesce(s5.s, 0) AS BIGINT) AS r FROM r4 LEFT JOIN s5 USING (node))
        |SELECT r5.node AS doc_id, r5.r AS rank_scaled,
        |       round(CAST(r5.r AS DOUBLE) / (p.n * 777600000.0), 9) AS rank
        |FROM r5, p ORDER BY doc_id""".stripMargin,
    // Personalized PageRank: same unrolled scaled-BIGINT walk, but
    // R_0 = [v ∈ S] and teleport mass lands only on the 10 seeds
    // (doc_id < 10); rank = R_5 / (|S| * 60^5)
    "q_ppr" ->
      """WITH p AS (SELECT count(*) AS n FROM documents),
        |e AS (
        |  SELECT doc_id AS src, (doc_id + 1) % n AS dst FROM documents, p
        |  UNION ALL SELECT doc_id, (doc_id * 2 + 3) % n FROM documents, p
        |  UNION ALL SELECT doc_id, (doc_id * doc_id + 5) % n FROM documents, p
        |),
        |r0 AS (SELECT doc_id AS node, CAST(CASE WHEN doc_id < 10 THEN 1 ELSE 0 END AS BIGINT) AS r FROM documents),
        |s1 AS (SELECT e.dst AS node, sum(r.r) AS s FROM e JOIN r0 r ON r.node = e.src GROUP BY e.dst),
        |r1 AS (SELECT r0.node, CAST(CASE WHEN r0.node < 10 THEN 9 ELSE 0 END + 17 * coalesce(s1.s, 0) AS BIGINT) AS r FROM r0 LEFT JOIN s1 USING (node)),
        |s2 AS (SELECT e.dst AS node, sum(r.r) AS s FROM e JOIN r1 r ON r.node = e.src GROUP BY e.dst),
        |r2 AS (SELECT r1.node, CAST(CASE WHEN r1.node < 10 THEN 540 ELSE 0 END + 17 * coalesce(s2.s, 0) AS BIGINT) AS r FROM r1 LEFT JOIN s2 USING (node)),
        |s3 AS (SELECT e.dst AS node, sum(r.r) AS s FROM e JOIN r2 r ON r.node = e.src GROUP BY e.dst),
        |r3 AS (SELECT r2.node, CAST(CASE WHEN r2.node < 10 THEN 32400 ELSE 0 END + 17 * coalesce(s3.s, 0) AS BIGINT) AS r FROM r2 LEFT JOIN s3 USING (node)),
        |s4 AS (SELECT e.dst AS node, sum(r.r) AS s FROM e JOIN r3 r ON r.node = e.src GROUP BY e.dst),
        |r4 AS (SELECT r3.node, CAST(CASE WHEN r3.node < 10 THEN 1944000 ELSE 0 END + 17 * coalesce(s4.s, 0) AS BIGINT) AS r FROM r3 LEFT JOIN s4 USING (node)),
        |s5 AS (SELECT e.dst AS node, sum(r.r) AS s FROM e JOIN r4 r ON r.node = e.src GROUP BY e.dst),
        |r5 AS (SELECT r4.node, CAST(CASE WHEN r4.node < 10 THEN 116640000 ELSE 0 END + 17 * coalesce(s5.s, 0) AS BIGINT) AS r FROM r4 LEFT JOIN s5 USING (node))
        |SELECT r5.node AS doc_id, r5.r AS rank_scaled,
        |       round(CAST(r5.r AS DOUBLE) / 7776000000.0, 9) AS rank
        |FROM r5 ORDER BY doc_id""".stripMargin,
    // hopping windows: win = 2·slide, so each event belongs to exactly
    // the two slide-aligned starts (t div slide − j)·slide, j ∈ {0,1}
    "q_hop_window" ->
      """WITH ev AS (SELECT epoch_us(ts) AS t, value FROM events),
        |h AS (
        |  SELECT ((t // 10800000000) - j) * 10800000000 AS win_start_us, value
        |  FROM ev CROSS JOIN range(2) r(j)
        |)
        |SELECT win_start_us, count(*) AS n,
        |       round(CAST(sum(CAST(value AS DECIMAL(28,12))) AS DOUBLE), 4) AS sum_value
        |FROM h GROUP BY win_start_us ORDER BY win_start_us""".stripMargin,
    // streaming hopping windows: identical truth to the batch form —
    // AvailableNow + complete mode must converge to the batch answer
    "q_stream_hop" ->
      """WITH ev AS (SELECT epoch_us(ts) AS t, value FROM events),
        |h AS (
        |  SELECT ((t // 10800000000) - j) * 10800000000 AS win_start_us, value
        |  FROM ev CROSS JOIN range(2) r(j)
        |)
        |SELECT win_start_us, count(*) AS n,
        |       round(CAST(sum(CAST(value AS DECIMAL(28,12))) AS DOUBLE), 4) AS sum_value
        |FROM h GROUP BY win_start_us ORDER BY win_start_us""".stripMargin,
    // attribution replay: IGNORE NULLS running last-touch under the
    // same (ts, event_id) order; integer-division minutes
    "q_attribution" -> AttributionOracle,
    // streaming/batch parity: the SAME oracle gates the stream form
    "q_stream_attribution" -> AttributionOracle,
    // transition matrix: lead() under the same total order (ts,
    // event_id); row-conditional p from exact BIGINT counts
    "q_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events
        |),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM seq
        |      WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
        |SELECT from_type, to_type, n,
        |       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 6) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "q_kmeans" -> kmeansOracleSql(dims = 8, k = 4, iters = 2),
    // k-center replay: same integer grid, exact-int distances², same
    // argmax/tie order, unrolled greedy rounds + coverage certificate
    "q_kcenter" ->
      s"""WITH pts AS MATERIALIZED (
         |  SELECT vec_id,
         |    list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings
         |), c0 AS (SELECT vec_id, q FROM pts ORDER BY vec_id LIMIT 1),
         |m0 AS MATERIALIZED (
         |  SELECT p.vec_id,
         |    CAST(sum((p.q[d+1] - c.q[d+1]) * (p.q[d+1] - c.q[d+1])) AS BIGINT) AS d2
         |  FROM pts p CROSS JOIN c0 c, range(64) r(d)
         |  GROUP BY p.vec_id
         |),
         |${kcRoundsSql(7)}
         |SELECT 0 AS sel_rank, vec_id, CAST(0 AS BIGINT) AS d2 FROM c0
         |${(1 to 7).map(t => s"UNION ALL SELECT $t, vec_id, d2 FROM s$t")
                     .mkString("\n")}
         |UNION ALL SELECT 8, CAST(NULL AS BIGINT), (SELECT max(d2) FROM m7)
         |ORDER BY sel_rank""".stripMargin,
    // grid-density replay: same quantization + packed cell ids;
    // component labels via recursive min-reachable closure over the
    // 8-adjacency of dense cells; isolated dense cells keep their id
    "q_grid_density" ->
      """WITH RECURSIVE pts AS (
        |  SELECT vec_id,
        |         CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.05) AS BIGINT) AS cx,
        |         CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.05) AS BIGINT) AS cy
        |  FROM embeddings
        |), dense AS (
        |  SELECT cx, cy, (cx + 4096) * 8192 + cy + 4096 AS cid
        |  FROM pts GROUP BY cx, cy HAVING count(*) >= 8
        |), ed AS (
        |  SELECT a.cid AS src, b.cid AS dst
        |  FROM dense a JOIN dense b
        |    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
        |   AND a.cid <> b.cid
        |), reach(node, label) AS (
        |  SELECT src, src FROM ed
        |  UNION
        |  SELECT e.src, r.label FROM ed e JOIN reach r ON r.node = e.dst
        |), lab AS (
        |  SELECT node AS cid, min(label) AS cluster FROM reach GROUP BY node
        |)
        |SELECT p.vec_id, p.cx, p.cy,
        |       CASE WHEN d.cid IS NOT NULL
        |            THEN coalesce(l.cluster, d.cid) END AS cluster
        |FROM pts p
        |LEFT JOIN dense d USING (cx, cy)
        |LEFT JOIN lab l ON l.cid = d.cid
        |ORDER BY p.vec_id""".stripMargin,
    // triangles: same synthetic edge formula as q_pagerank, normalized
    // to undirected simple edges; x<y<z is structural after least/
    // greatest normalization, so each triangle appears exactly once
    "q_triangles" ->
      """WITH p AS (SELECT count(*) AS n FROM documents),
        |raw AS (
        |  SELECT doc_id AS src, (doc_id + 1) % n AS dst FROM documents, p
        |  UNION ALL SELECT doc_id, (doc_id * 2 + 3) % n FROM documents, p
        |  UNION ALL SELECT doc_id, (doc_id * doc_id + 5) % n FROM documents, p
        |),
        |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |      FROM raw WHERE src <> dst)
        |SELECT e1.a AS node, count(*) AS n_triangles
        |FROM e e1
        |JOIN e e2 ON e2.a = e1.b
        |JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |GROUP BY e1.a ORDER BY node""".stripMargin,
    // EWMA: the same 6 unrolled lag terms under the same total order;
    // power-of-two weights make every product exact, the +-chain
    // associates left like the engine's fold — raw doubles hash-match
    "q_ewma" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, CAST(value AS DOUBLE) AS v,
        |         lag(CAST(value AS DOUBLE), 1) OVER w AS l1,
        |         lag(CAST(value AS DOUBLE), 2) OVER w AS l2,
        |         lag(CAST(value AS DOUBLE), 3) OVER w AS l3,
        |         lag(CAST(value AS DOUBLE), 4) OVER w AS l4,
        |         lag(CAST(value AS DOUBLE), 5) OVER w AS l5,
        |         lag(CAST(value AS DOUBLE), 6) OVER w AS l6
        |  FROM events WHERE user_id < 30
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT user_id, event_id, v AS value,
        |       (COALESCE(v * 1.0, 0.0) + COALESCE(l1 * 0.5, 0.0)
        |        + COALESCE(l2 * 0.25, 0.0) + COALESCE(l3 * 0.125, 0.0)
        |        + COALESCE(l4 * 0.0625, 0.0) + COALESCE(l5 * 0.03125, 0.0)
        |        + COALESCE(l6 * 0.015625, 0.0))
        |       /
        |       (COALESCE(CASE WHEN v IS NOT NULL THEN 1.0 END, 0.0)
        |        + COALESCE(CASE WHEN l1 IS NOT NULL THEN 0.5 END, 0.0)
        |        + COALESCE(CASE WHEN l2 IS NOT NULL THEN 0.25 END, 0.0)
        |        + COALESCE(CASE WHEN l3 IS NOT NULL THEN 0.125 END, 0.0)
        |        + COALESCE(CASE WHEN l4 IS NOT NULL THEN 0.0625 END, 0.0)
        |        + COALESCE(CASE WHEN l5 IS NOT NULL THEN 0.03125 END, 0.0)
        |        + COALESCE(CASE WHEN l6 IS NOT NULL THEN 0.015625 END, 0.0)) AS ewma
        |FROM seq ORDER BY user_id, event_id""".stripMargin,
    // HITS: 2 rounds unrolled — scatter (sum h over in-edges) then
    // gather (sum a over out-edges), isolated-node zeros via LEFT JOIN
    "q_hits" ->
      """WITH p AS (SELECT count(*) AS n FROM documents),
        |e AS (
        |  SELECT doc_id AS src, (doc_id + 1) % n AS dst FROM documents, p
        |  UNION ALL SELECT doc_id, (doc_id * 2 + 3) % n FROM documents, p
        |  UNION ALL SELECT doc_id, (doc_id * doc_id + 5) % n FROM documents, p
        |),
        |h0 AS (SELECT doc_id AS node, CAST(1 AS BIGINT) AS h FROM documents),
        |a1 AS (SELECT h0.node, CAST(coalesce(x.s, 0) AS BIGINT) AS a FROM h0
        |       LEFT JOIN (SELECT e.dst AS node, sum(h.h) AS s FROM e
        |                  JOIN h0 h ON h.node = e.src GROUP BY e.dst) x USING (node)),
        |h1 AS (SELECT a1.node, CAST(coalesce(x.s, 0) AS BIGINT) AS h FROM a1
        |       LEFT JOIN (SELECT e.src AS node, sum(a.a) AS s FROM e
        |                  JOIN a1 a ON a.node = e.dst GROUP BY e.src) x USING (node)),
        |a2 AS (SELECT h1.node, CAST(coalesce(x.s, 0) AS BIGINT) AS a FROM h1
        |       LEFT JOIN (SELECT e.dst AS node, sum(h.h) AS s FROM e
        |                  JOIN h1 h ON h.node = e.src GROUP BY e.dst) x USING (node)),
        |h2 AS (SELECT a2.node, CAST(coalesce(x.s, 0) AS BIGINT) AS h FROM a2
        |       LEFT JOIN (SELECT e.src AS node, sum(a.a) AS s FROM e
        |                  JOIN a2 a ON a.node = e.dst GROUP BY e.src) x USING (node))
        |SELECT h2.node AS doc_id, h2.h AS hub, a2.a AS auth
        |FROM h2 JOIN a2 USING (node) ORDER BY doc_id""".stripMargin,
    // association rules: the oracle is the NAIVE basket self-join the
    // engine refuses to run — equality proves the engine's in-row
    // upper-triangle pair generation is complete. Metrics are single
    // IEEE divides off BIGINT counts: published raw, bit-exact.
    "q_item_assoc" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
        |nb AS (SELECT count(DISTINCT bk) AS n FROM items),
        |pc AS (
        |  SELECT a.it AS item_a, b.it AS item_b, count(*) AS n_ab
        |  FROM items a JOIN items b ON a.bk = b.bk AND a.it < b.it
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |ic AS (SELECT it, count(*) AS n FROM items GROUP BY it)
        |SELECT item_a, item_b, n_ab, ia.n AS n_a, ib.n AS n_b,
        |       CAST(n_ab AS DOUBLE) / ia.n AS conf_ab,
        |       CAST(n_ab AS DOUBLE) / ib.n AS conf_ba,
        |       (CAST(n_ab AS DOUBLE) * nb.n) /
        |       (CAST(ia.n AS DOUBLE) * ib.n) AS lift
        |FROM pc JOIN ic ia ON ia.it = pc.item_a
        |        JOIN ic ib ON ib.it = pc.item_b, nb
        |ORDER BY item_a, item_b""".stripMargin,
    // SCD2: same gaps-and-islands (IS DISTINCT FROM = Spark's <=>
    // negated) and the same (ts, event_id) total order in both windows
    "q_scd2" ->
      """WITH marked AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         (row_number() OVER w = 1 OR
        |          lag(event_type) OVER w IS DISTINCT FROM event_type)
        |         AS is_new
        |  FROM events WHERE user_id < 40
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |starts AS (
        |  SELECT user_id, event_type, ts, event_id FROM marked WHERE is_new)
        |SELECT user_id, event_type, ts AS valid_from,
        |       event_id AS first_event_id,
        |       lead(ts) OVER w AS valid_to,
        |       row_number() OVER w AS version
        |FROM starts
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin,
    // unpivot: the UNION ALL long form — values pass through untouched
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
        |       l_quantity AS value
        |FROM lineitem WHERE l_orderkey % 97 = 0
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |FROM lineitem WHERE l_orderkey % 97 = 0
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |FROM lineitem WHERE l_orderkey % 97 = 0
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        |FROM lineitem WHERE l_orderkey % 97 = 0
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
    // partition pruning: the layout round-trip must surface exactly the
    // filtered slice of the source table
    "q_partition_prune" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE lang = 'en' ORDER BY doc_id""".stripMargin,
    // profile: one UNION ALL branch per column — min/max are
    // pass-through data values (exact), counts are integers
    "q_profile" -> Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
      .map(c =>
        s"""SELECT '$c' AS col_name, CAST(min($c) AS DOUBLE) AS min_v,
           |  CAST(max($c) AS DOUBLE) AS max_v,
           |  count(CASE WHEN $c IS NULL THEN 1 END) AS n_nulls,
           |  count(DISTINCT $c) AS ndv, count(*) AS n_rows
           |FROM lineitem""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    // histogram: one UNION ALL branch per (column, width); floor of an
    // IEEE double division is bit-identical on both engines
    "q_histogram" -> Seq("l_extendedprice" -> "5000.0", "l_quantity" -> "5.0")
      .map { case (c, w) =>
        s"""SELECT '$c' AS col_name,
           |  CAST(floor($c / $w) AS BIGINT) AS bin, count(*) AS n
           |FROM lineitem GROUP BY 2""".stripMargin }
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name, bin"),
    // correlation matrix: identical exact decimal moments, then the
    // SAME double expression shape as the engine (op-for-op — IEEE
    // equality needs matching evaluation order); `+ 0.0` folds any
    // rounded -0.0 to +0.0 on both engines
    "q_corr_matrix" -> {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      def dm(c: String) = s"CAST($c AS DECIMAL(18,2))"
      val moments = cs.zipWithIndex.flatMap { case (c, i) => Seq(
        s"CAST(sum(${dm(c)}) AS DOUBLE) AS s_$i",
        s"CAST(sum(${dm(c)} * ${dm(c)}) AS DOUBLE) AS ss_$i") } ++
        (for { i <- cs.indices; j <- cs.indices if i < j } yield
          s"CAST(sum(${dm(cs(i))} * ${dm(cs(j))}) AS DOUBLE) AS sp_${i}_$j")
      val branches = (for { i <- cs.indices; j <- cs.indices if i < j } yield
        s"""SELECT '${cs(i)}' AS col_a, '${cs(j)}' AS col_b,
           |  CASE WHEN (n*ss_$i - s_$i*s_$i) > 0 AND (n*ss_$j - s_$j*s_$j) > 0
           |       THEN round((n*sp_${i}_$j - s_$i*s_$j)
           |            / sqrt((n*ss_$i - s_$i*s_$i) * (n*ss_$j - s_$j*s_$j)), 6) + 0.0
           |  END AS corr, n_rows FROM m""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH m AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n, count(*) AS n_rows,
         |  ${moments.mkString(",\n  ")}
         |  FROM lineitem
         |)
         |$branches
         |ORDER BY col_a, col_b""".stripMargin
    },
    // snapshot diff: the same two snapshot CTEs full-outer-joined;
    // IS DISTINCT FROM mirrors the engine's null-safe struct compare
    "q_snapshot_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 11 <> 0),
        |n AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 13 <> 0)
        |SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |            WHEN n.o_orderkey IS NULL THEN 'delete'
        |            ELSE 'update' END AS change,
        |       o.o_orderstatus AS old_o_orderstatus,
        |       n.o_orderstatus AS new_o_orderstatus,
        |       o.o_totalprice AS old_o_totalprice,
        |       n.o_totalprice AS new_o_totalprice
        |FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
        |WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
        |   OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |   OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
        |ORDER BY o_orderkey""".stripMargin,
    // interval merge: the same cummax gaps-and-islands in SQL; exact
    // integer micros, strict-overlap islands (touching stays separate)
    "q_interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS s_us,
        |         epoch_us(ts) + (600 + event_id % 1200) * 1000000 AS e_us
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, s_us, e_us,
        |         CASE WHEN max(e_us) OVER wp IS NULL
        |              OR s_us >= max(e_us) OVER wp THEN 1 ELSE 0 END AS brk
        |  FROM iv
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY s_us, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |s AS (
        |  SELECT user_id, s_us, e_us,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY s_us, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS island
        |  FROM m)
        |SELECT user_id, min(s_us) AS start_us, max(e_us) AS end_us,
        |       count(*) AS n_events
        |FROM s GROUP BY user_id, island
        |ORDER BY user_id, start_us""".stripMargin,
    // OHLC: DuckDB's ordered aggregates replay the min_by/max_by pair;
    // values pass through exact, buckets are integer micros
    "q_ohlc" ->
      """WITH ev AS (
        |  SELECT event_type, event_id, value, epoch_us(ts) AS t,
        |         (epoch_us(ts) // 21600000000) * 21600000000 AS bucket_us
        |  FROM events)
        |SELECT event_type, bucket_us,
        |       first(value ORDER BY t, event_id) AS open,
        |       max(value) AS high, min(value) AS low,
        |       last(value ORDER BY t, event_id) AS close,
        |       count(*) AS n
        |FROM ev GROUP BY event_type, bucket_us
        |ORDER BY event_type, bucket_us""".stripMargin,
    // VWAP: decimal-exact sums rounded IN DECIMAL to 4 dp, then cast —
    // a scale-4 decimal → double conversion is correctly rounded on
    // both engines, so the sums AND their quotient (vwap is defined
    // from the published sums) are bit-identical; the raw scale-12
    // quotient was not (double→decimal(28,12) casts differ at the last
    // scale digit and the ratio surfaces the tie). year/month cast to
    // INTEGER to match Spark's int-typed calendar fields.
    "q_vwap" ->
      """SELECT l_partkey % 100 AS symbol,
        |       CAST(year(l_shipdate) AS INTEGER) AS y,
        |       CAST(month(l_shipdate) AS INTEGER) AS m,
        |       count(*) AS n,
        |       CAST(round(sum(CAST(l_quantity AS DECIMAL(28,12))), 4) AS DOUBLE)
        |         AS sum_qty,
        |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,12))), 4) AS DOUBLE)
        |         AS sum_price,
        |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,12))), 4) AS DOUBLE)
        |             / CAST(round(sum(CAST(l_quantity AS DECIMAL(28,12))), 4) AS DOUBLE)
        |         AS vwap
        |FROM lineitem GROUP BY 1, 2, 3
        |ORDER BY symbol, y, m""".stripMargin,
    // MERGE: the declarative rebuild — deletes filtered, replacements
    // CASEd in place, inserts appended; + 2.5 / + 0.25 are single IEEE
    // adds, bit-identical on both engines
    "q_merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders)
        |SELECT o_orderkey,
        |       CASE WHEN o_orderkey % 7 = 0 THEN 'U' ELSE o_orderstatus END
        |         AS o_orderstatus,
        |       CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 2.5
        |            ELSE o_totalprice END AS o_totalprice
        |FROM base WHERE o_orderkey % 13 <> 0
        |UNION ALL
        |SELECT o_orderkey + 100000000, 'N', o_totalprice + 0.25
        |FROM base WHERE o_orderkey % 97 = 0
        |ORDER BY o_orderkey""".stripMargin,
    // data-quality report: one UNION ALL branch per expectation
    "q_dq_checks" ->
      """SELECT 'orders_pk_unique' AS rule, count(*) AS n_checked,
        |       count(*) - count(DISTINCT o_orderkey) AS n_violations
        |FROM orders
        |UNION ALL
        |SELECT 'lineitem_orders_fk', count(*),
        |       count(CASE WHEN o.o_orderkey IS NULL THEN 1 END)
        |FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |  ON l.l_orderkey = o.o_orderkey
        |UNION ALL
        |SELECT 'orders_customer_fk', count(*),
        |       count(CASE WHEN c.c_custkey IS NULL THEN 1 END)
        |FROM orders r LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |  ON r.o_custkey = c.c_custkey
        |UNION ALL
        |SELECT 'l_quantity_in_1_30', count(*),
        |       count(CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 30,
        |                                    FALSE) THEN 1 END)
        |FROM lineitem
        |UNION ALL
        |SELECT 'o_totalprice_positive', count(*),
        |       count(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE) THEN 1 END)
        |FROM orders
        |ORDER BY rule""".stripMargin,
    // BFS: the same frontier recursion unrolled — hK = dsts of h{K-1}
    // not yet seen; MATERIALIZED so the chain evaluates once per round
    "q_bfs" ->
      """WITH p AS (SELECT count(*) AS n FROM documents),
        |e AS MATERIALIZED (
        |  SELECT doc_id AS src, (doc_id + 1) % n AS dst FROM documents, p
        |  UNION ALL SELECT doc_id, (doc_id * 2 + 3) % n FROM documents, p
        |  UNION ALL SELECT doc_id, (doc_id * doc_id + 5) % n FROM documents, p
        |),
        |h0 AS MATERIALIZED (
        |  SELECT doc_id AS node, 0 AS hop FROM documents WHERE doc_id % 97 = 0),
        |h1 AS MATERIALIZED (
        |  SELECT DISTINCT e.dst AS node, 1 AS hop FROM e
        |  JOIN h0 ON h0.node = e.src
        |  WHERE e.dst NOT IN (SELECT node FROM h0)),
        |h2 AS MATERIALIZED (
        |  SELECT DISTINCT e.dst AS node, 2 AS hop FROM e
        |  JOIN h1 ON h1.node = e.src
        |  WHERE e.dst NOT IN (SELECT node FROM h0)
        |    AND e.dst NOT IN (SELECT node FROM h1)),
        |h3 AS MATERIALIZED (
        |  SELECT DISTINCT e.dst AS node, 3 AS hop FROM e
        |  JOIN h2 ON h2.node = e.src
        |  WHERE e.dst NOT IN (SELECT node FROM h0)
        |    AND e.dst NOT IN (SELECT node FROM h1)
        |    AND e.dst NOT IN (SELECT node FROM h2)),
        |h4 AS MATERIALIZED (
        |  SELECT DISTINCT e.dst AS node, 4 AS hop FROM e
        |  JOIN h3 ON h3.node = e.src
        |  WHERE e.dst NOT IN (SELECT node FROM h0)
        |    AND e.dst NOT IN (SELECT node FROM h1)
        |    AND e.dst NOT IN (SELECT node FROM h2)
        |    AND e.dst NOT IN (SELECT node FROM h3))
        |SELECT node AS doc_id, hop FROM (
        |  SELECT * FROM h0 UNION ALL SELECT * FROM h1
        |  UNION ALL SELECT * FROM h2 UNION ALL SELECT * FROM h3
        |  UNION ALL SELECT * FROM h4)
        |ORDER BY doc_id""".stripMargin,
    // same block/embargo integer arithmetic on epoch micros; NULLS
    // FIRST pins the purged row's position to Spark's asc default
    "q_time_folds" ->
      """WITH t AS (
        |  SELECT CASE WHEN epoch_us(ts) % 21600000000 >= 900000000
        |              AND epoch_us(ts) % 21600000000 < 21600000000 - 900000000
        |         THEN (epoch_us(ts) // 21600000000) % 5 END AS fold,
        |         epoch_us(ts) % 21600000000 AS off
        |  FROM events)
        |SELECT fold, count(*) AS n, min(off) AS min_off, max(off) AS max_off,
        |       fold IS NULL OR (min(off) >= 900000000
        |         AND max(off) < 21600000000 - 900000000) AS no_leak
        |FROM t GROUP BY fold ORDER BY fold NULLS FIRST""".stripMargin,
    // DP counts: same md5-open uniform, same inverse-CDF shape op for
    // op; noisy_n published RAW (one multiply + one add on identical
    // doubles after the 9-dp ln rounding)
    "q_dp_counts" ->
      """WITH g AS (
        |  SELECT event_type, count(*) AS n FROM events GROUP BY event_type
        |), u AS (
        |  SELECT event_type, n,
        |         (('0x' || substring(md5(event_type || '|dp1'), 1, 6))::BIGINT
        |           + 0.5) / 16777216.0 AS u
        |  FROM g
        |)
        |SELECT event_type, CAST(0.5 AS DOUBLE) AS epsilon,
        |       CAST(n AS DOUBLE) + (-2.0) * sign(u - 0.5)
        |         * round(ln(1.0 - 2.0 * abs(u - 0.5)), 9) AS noisy_n
        |FROM u ORDER BY event_type""".stripMargin,
    // synchronous LPA unrolled: per round, neighbor-majority vote with
    // row_number (cnt DESC, label ASC) replaying the engine's
    // bit-packed argmax semantics; undirected simple projection first
    "q_lpa" -> {
      def round(prev: String, cur: String): String =
        s"""$cur AS MATERIALIZED (
           |  SELECT node, label FROM (
           |    SELECT s.node, l.label, count(*) AS cnt,
           |           row_number() OVER (PARTITION BY s.node
           |             ORDER BY count(*) DESC, l.label) AS rn
           |    FROM sym s JOIN $prev l ON l.node = s.nbr
           |    GROUP BY s.node, l.label)
           |  WHERE rn = 1)""".stripMargin
      s"""WITH p AS (SELECT count(*) AS n FROM documents),
         |raw AS (
         |  SELECT doc_id AS src, (doc_id + 1) % n AS dst FROM documents, p
         |  UNION ALL SELECT doc_id, (doc_id * 2 + 3) % n FROM documents, p
         |  UNION ALL SELECT doc_id, (doc_id * doc_id + 5) % n FROM documents, p
         |),
         |und AS MATERIALIZED (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM raw WHERE src <> dst
         |),
         |sym AS MATERIALIZED (
         |  SELECT a AS node, b AS nbr FROM und
         |  UNION ALL SELECT b AS node, a AS nbr FROM und
         |),
         |l0 AS MATERIALIZED (
         |  SELECT DISTINCT node, node AS label FROM sym),
         |${round("l0", "l1")},
         |${round("l1", "l2")},
         |${round("l2", "l3")}
         |SELECT node AS doc_id, label AS community FROM l3
         |ORDER BY doc_id""".stripMargin
    },
    // k-core: unrolled synchronous peeling over the same synthetic
    // graph — keep nodes of degree >= 4, restrict edges, repeat
    // link prediction: same wedge enumeration, NOT EXISTS for the
    // non-adjacency filter, inclusion-exclusion union degree
    "q_link_pred" ->
      """WITH p AS (SELECT count(*) AS n FROM documents),
        |raw AS (
        |  SELECT doc_id AS src, (doc_id + 1) % n AS dst FROM documents, p
        |  UNION ALL SELECT doc_id, (doc_id * 2 + 3) % n FROM documents, p
        |  UNION ALL SELECT doc_id, (doc_id * doc_id + 5) % n FROM documents, p
        |),
        |und AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM raw WHERE src <> dst
        |),
        |sym AS MATERIALIZED (
        |  SELECT a AS node, b AS nbr FROM und
        |  UNION ALL SELECT b AS node, a AS nbr FROM und
        |),
        |cn AS (
        |  SELECT x.node AS a, y.node AS b, count(*) AS n_common
        |  FROM sym x JOIN sym y ON x.nbr = y.nbr AND x.node < y.node
        |  GROUP BY x.node, y.node HAVING count(*) >= 2
        |),
        |deg AS (SELECT node, count(*) AS deg FROM sym GROUP BY node)
        |SELECT cn.a, cn.b, cn.n_common,
        |       round(CAST(cn.n_common AS DOUBLE)
        |             / (da.deg + db.deg - cn.n_common), 6) AS jaccard
        |FROM cn
        |JOIN deg da ON da.node = cn.a
        |JOIN deg db ON db.node = cn.b
        |WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.a = cn.a AND und.b = cn.b)
        |ORDER BY a, b""".stripMargin,
    // cascade replay: the same key list, semi-joins as IN subqueries
    "q_gdpr_cascade" ->
      """WITH del AS (
        |  SELECT DISTINCT c_custkey AS k FROM customer WHERE c_custkey % 97 = 0
        |), delord AS (
        |  SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT k FROM del)
        |)
        |SELECT 'customer' AS table_name, count(*) AS n_before,
        |       CAST(sum(CASE WHEN c_custkey IN (SELECT k FROM del) THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
        |       count(*) - CAST(sum(CASE WHEN c_custkey IN (SELECT k FROM del) THEN 1 ELSE 0 END) AS BIGINT) AS n_after
        |FROM customer
        |UNION ALL
        |SELECT 'events', count(*),
        |       CAST(sum(CASE WHEN user_id IN (SELECT k FROM del) THEN 1 ELSE 0 END) AS BIGINT),
        |       count(*) - CAST(sum(CASE WHEN user_id IN (SELECT k FROM del) THEN 1 ELSE 0 END) AS BIGINT)
        |FROM events
        |UNION ALL
        |SELECT 'lineitem', count(*),
        |       CAST(sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM delord) THEN 1 ELSE 0 END) AS BIGINT),
        |       count(*) - CAST(sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM delord) THEN 1 ELSE 0 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'orders', count(*),
        |       CAST(sum(CASE WHEN o_custkey IN (SELECT k FROM del) THEN 1 ELSE 0 END) AS BIGINT),
        |       count(*) - CAST(sum(CASE WHEN o_custkey IN (SELECT k FROM del) THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders
        |ORDER BY table_name""".stripMargin,
    // RFM replay: the equiDepth boundary construction per metric on
    // the distinct-value tables; sums CAST to BIGINT (HUGEINT rule)
    "q_rfm" -> {
      def sc(m: String, a: String): String =
        s"""${a}_b AS MATERIALIZED (
           |  SELECT min(CASE WHEN cum >= (i * nt.n + 4) // 5 THEN v END) AS b
           |  FROM (SELECT v, sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
           |        FROM (SELECT $m AS v, count(*) AS cnt FROM st GROUP BY 1))
           |       CROSS JOIN nt CROSS JOIN range(1, 5) r(i)
           |  GROUP BY i),
           |${a}_s AS MATERIALIZED (
           |  SELECT cust, CAST(1 + sum(CASE WHEN st.$m > b.b THEN 1 ELSE 0 END) AS BIGINT) AS $a
           |  FROM st CROSS JOIN ${a}_b b GROUP BY cust)""".stripMargin
      s"""WITH st AS MATERIALIZED (
         |  SELECT o_custkey AS cust,
         |         date_diff('day', CAST(max(o_orderdate) AS DATE), a.mx) AS recency_days,
         |         count(*) AS frequency,
         |         round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,12))) AS DOUBLE), 4) AS monetary
         |  FROM orders CROSS JOIN
         |       (SELECT CAST(max(o_orderdate) AS DATE) AS mx FROM orders) a
         |  GROUP BY o_custkey, a.mx
         |),
         |nt AS (SELECT count(*) AS n FROM st),
         |${sc("recency_days", "r_score")},
         |${sc("frequency", "f_score")},
         |${sc("monetary", "m_score")}
         |SELECT st.cust AS o_custkey, st.recency_days, st.frequency, st.monetary,
         |       r.r_score, f.f_score, m.m_score,
         |       r.r_score::VARCHAR || f.f_score::VARCHAR || m.m_score::VARCHAR AS segment
         |FROM st
         |JOIN r_score_s r USING (cust)
         |JOIN f_score_s f USING (cust)
         |JOIN m_score_s m USING (cust)
         |ORDER BY o_custkey""".stripMargin
    },
    // k-anonymity ladder replay: level-0 groups ≥ 5 as-is, residue
    // generalizes segment then collapses to the ('ANY','ANY') bucket
    "q_kanon" ->
      """WITH g0 AS (
        |  SELECT CAST(c_nationkey AS VARCHAR) AS q1, c_mktsegment AS q2,
        |         count(*) AS n
        |  FROM customer GROUP BY 1, 2
        |), g1 AS (
        |  SELECT q1, CAST(sum(n) AS BIGINT) AS n FROM g0 WHERE n < 5 GROUP BY q1
        |), rel2 AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n FROM g1 WHERE n < 5
        |)
        |SELECT q1, q2, n, 0 AS level FROM g0 WHERE n >= 5
        |UNION ALL
        |SELECT q1, 'ANY', n, 1 FROM g1 WHERE n >= 5
        |UNION ALL
        |SELECT 'ANY', 'ANY', n, 2 FROM rel2 WHERE n IS NOT NULL
        |ORDER BY level, q1, q2""".stripMargin,
    "q_kcore" -> {
      def round(prev: String, i: Int): String =
        s"""kept$i AS MATERIALIZED (
           |  SELECT node FROM $prev GROUP BY node HAVING count(*) >= 4),
           |sym$i AS MATERIALIZED (
           |  SELECT s.node, s.nbr FROM $prev s
           |  JOIN kept$i a ON a.node = s.node
           |  JOIN kept$i b ON b.node = s.nbr)""".stripMargin
      s"""WITH p AS (SELECT count(*) AS n FROM documents),
         |raw AS (
         |  SELECT doc_id AS src, (doc_id + 1) % n AS dst FROM documents, p
         |  UNION ALL SELECT doc_id, (doc_id * 2 + 3) % n FROM documents, p
         |  UNION ALL SELECT doc_id, (doc_id * doc_id + 5) % n FROM documents, p
         |),
         |und AS MATERIALIZED (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM raw WHERE src <> dst
         |),
         |sym0 AS MATERIALIZED (
         |  SELECT a AS node, b AS nbr FROM und
         |  UNION ALL SELECT b AS node, a AS nbr FROM und
         |),
         |${round("sym0", 1)},
         |${round("sym1", 2)},
         |${round("sym2", 3)},
         |${round("sym3", 4)},
         |${round("sym4", 5)}
         |SELECT node AS doc_id, count(*) AS deg FROM sym5
         |GROUP BY node ORDER BY doc_id""".stripMargin
    },
    // incremental agg: the from-scratch aggregate of the new snapshot —
    // equality proves the engine's old+delta decimal algebra exact
    "q_incr_agg" ->
      """WITH cur AS (
        |  SELECT CASE WHEN o_orderkey % 19 = 0 THEN o_custkey + 1
        |              ELSE o_custkey END AS grp,
        |         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
        |              ELSE o_totalprice END AS v
        |  FROM orders WHERE o_orderkey % 13 <> 0)
        |SELECT grp AS o_custkey, count(*) AS n,
        |       round(CAST(sum(CAST(v AS DECIMAL(38,12))) AS DOUBLE), 4) AS total
        |FROM cur GROUP BY grp ORDER BY o_custkey""".stripMargin,
    // skyline: the unpruned dominance quantifier — equality against the
    // engine's bucket-pruned plan is a completeness proof
    "q_skyline" ->
      """WITH st AS (
        |  SELECT user_id, count(*) AS n_events, max(value) AS max_value
        |  FROM events GROUP BY user_id
        |)
        |SELECT user_id, n_events, max_value FROM st s
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM st q
        |  WHERE q.n_events >= s.n_events AND q.max_value >= s.max_value
        |    AND (q.n_events > s.n_events OR q.max_value > s.max_value))
        |ORDER BY user_id""".stripMargin,
    // bucketed join: plain join over the raw tables — the bucketed
    // layout must change the plan, never the answer
    "q_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,12))) AS DOUBLE), 4) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // per-dim z-score: stats over all 64 dims (decMean + rounded
    // stddev_pop), z from the PUBLISHED rounded pair, slice dim < 8
    "q_embed_zscore" ->
      """WITH ex AS (
        |  SELECT vec_id, d AS dim, CAST(embedding[d+1] AS DOUBLE) AS x
        |  FROM embeddings, range(64) r(d)
        |), st AS (
        |  SELECT dim,
        |         round(CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
        |               / count(*), 6) AS mean,
        |         round(stddev_pop(x), 6) AS std
        |  FROM ex GROUP BY dim
        |)
        |SELECT ex.vec_id, ex.dim, ex.x,
        |       CASE WHEN st.std > 0
        |            THEN round((ex.x - st.mean) / st.std, 4) + 0.0 END AS z
        |FROM ex JOIN st USING (dim) WHERE ex.dim < 8
        |ORDER BY vec_id, dim""".stripMargin,
    // rolling anomaly: decimal-exact frame mean + rounded frame stddev
    // (6 PRECEDING..1 PRECEDING, total order), z from the published
    // pair, null under cold start (n_prior < 4) or zero variance
    "q_ts_anomaly" -> TsAnomalyOracle,
    // same oracle: streaming-vs-batch parity is the tested property
    "q_stream_anomaly" -> TsAnomalyOracle,
    // data mixing: targets recomputed from the domain name ((1 + N%4)/50
    // for srcN, N < 20 — mirrors SparkEntry.mixTargets), weights with the
    // same left-to-right association as the engine, and the resample's
    // copy counts from the same Knuth hash threshold
    "q_mixture_weights" ->
      """WITH pd AS (
        |  SELECT source AS domain, count(*) AS n_docs, sum(n_chars) AS mass
        |  FROM documents GROUP BY source
        |), t AS (
        |  SELECT domain, n_docs, mass, sum(mass) OVER () AS total FROM pd
        |)
        |SELECT domain, n_docs, CAST(mass AS BIGINT) AS mass,
        |       round(CAST(mass AS DOUBLE) / total, 6) AS actual_frac,
        |       round(CASE WHEN CAST(substring(domain, 4) AS INTEGER) < 20
        |                  THEN (1.0 + (CAST(substring(domain, 4) AS INTEGER) % 4)) / 50.0
        |                  ELSE 0.0 END, 6) AS target_frac,
        |       round(CASE WHEN CAST(substring(domain, 4) AS INTEGER) < 20
        |                  THEN (1.0 + (CAST(substring(domain, 4) AS INTEGER) % 4)) / 50.0
        |                  ELSE 0.0 END * total / mass, 6) AS weight
        |FROM t ORDER BY domain""".stripMargin,
    "q_mixture_resample" ->
      """WITH pd AS (
        |  SELECT source AS domain, sum(n_chars) AS mass FROM documents GROUP BY source
        |), t AS (
        |  SELECT domain, mass, sum(mass) OVER () AS total FROM pd
        |), w AS (
        |  SELECT domain,
        |         CASE WHEN CAST(substring(domain, 4) AS INTEGER) < 20
        |              THEN (1.0 + (CAST(substring(domain, 4) AS INTEGER) % 4)) / 50.0
        |              ELSE 0.0 END * total / mass AS weight
        |  FROM t
        |), d AS (
        |  SELECT doc_id, w.domain,
        |         CAST(floor(weight) AS BIGINT) +
        |         (CASE WHEN (doc_id * 2654435761) % 4294967296 / 4294967296.0
        |                    < weight - floor(weight) THEN 1 ELSE 0 END) AS n_copies
        |  FROM documents JOIN w ON w.domain = documents.source
        |)
        |SELECT doc_id, domain, c + 1 AS copy_no
        |FROM d JOIN range(8) t(c) ON c < n_copies
        |ORDER BY doc_id, copy_no""".stripMargin,
    // identical construction to q_decontaminate (the bloom prefilter is
    // exact by design, so the oracle is the plain containment query) on
    // the mod-5 slice at threshold 0.25
    "q_bloom_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s
        |  FROM toks JOIN range(2000) t(i) ON i + 3 <= len(ws)
        |), sz AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), co AS (
        |  SELECT a.doc_id AS train_id, b.doc_id AS eval_id, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
        |  GROUP BY a.doc_id, b.doc_id
        |)
        |SELECT co.train_id, co.eval_id,
        |       round(CAST(inter AS DOUBLE) / x.n, 6) AS frac
        |FROM co JOIN sz x ON x.doc_id = co.train_id
        |WHERE CAST(inter AS DOUBLE) / x.n >= 0.25
        |ORDER BY train_id, eval_id""".stripMargin,
    // capped variant: the eval-df CTE drops stop shingles (df > 1 on
    // the EVAL side) from the intersection; sizes stay full — frac is
    // the conservative lower bound the engine publishes
    "q_decontam_capped" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s
        |  FROM toks JOIN range(2000) t(i) ON i + 3 <= len(ws)
        |), keep AS (
        |  SELECT s FROM sh WHERE doc_id % 5 = 0 GROUP BY s HAVING count(*) <= 1
        |), sz AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), co AS (
        |  SELECT a.doc_id AS train_id, b.doc_id AS eval_id, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
        |  JOIN keep k ON k.s = a.s
        |  GROUP BY a.doc_id, b.doc_id
        |)
        |SELECT co.train_id, co.eval_id,
        |       round(CAST(inter AS DOUBLE) / x.n, 6) AS frac
        |FROM co JOIN sz x ON x.doc_id = co.train_id
        |WHERE CAST(inter AS DOUBLE) / x.n >= 0.1
        |ORDER BY train_id, eval_id""".stripMargin,
    "q_stream_window" ->
      s"""SELECT epoch_us(date_trunc('hour', ts)) AS start_us, count(*) AS n,
         |       ${decMeanSql("value")} AS mean_value
         |FROM events GROUP BY date_trunc('hour', ts)
         |ORDER BY start_us""".stripMargin,
    // batch replay of the windowed type counts + rank ≤ 3; rk cast to
    // INTEGER to match Spark's row_number type
    "q_stream_topk" ->
      """WITH wc AS (
        |  SELECT epoch_us(ts) // 21600000000 * 21600000000 AS win_start_us,
        |         event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), rk AS (
        |  SELECT win_start_us, event_type, n,
        |         CAST(row_number() OVER (PARTITION BY win_start_us
        |                ORDER BY n DESC, event_type) AS INTEGER) AS rk
        |  FROM wc
        |)
        |SELECT win_start_us, event_type, n, rk FROM rk WHERE rk <= 3
        |ORDER BY win_start_us, rk""".stripMargin,
    // the batch join IS the truth for a stateless stream-static join
    "q_stream_static_join" ->
      """SELECT event_id, user_id, c_mktsegment AS segment,
        |       round(c_acctbal, 2) AS acctbal
        |FROM events JOIN customer ON user_id = c_custkey
        |ORDER BY event_id""".stripMargin,
    "q_csv_roundtrip" -> DocsMetaOracle,
    "q_json_roundtrip" -> DocsMetaOracle,
    // gzip codec path: same truth — only the file format differs
    "q_csv_gz" -> DocsMetaOracle,
    "q_json_gz" -> DocsMetaOracle,
    "q_orc_roundtrip" -> DocsMetaOracle,
    "q_parquet_zstd" -> DocsMetaOracle,
    // the old-schema batch (even ids) lost source/n_chars on write; the
    // merged read must resurface exactly those rows with the sentinels
    "q_schema_evolution" ->
      """SELECT doc_id, lang,
        |       CASE WHEN doc_id % 2 = 0 THEN '_absent' ELSE source END AS source,
        |       CASE WHEN doc_id % 2 = 0 THEN -1 ELSE n_chars END AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_full_outer" ->
      """WITH wo AS (
        |  SELECT o_custkey AS custkey, count(*) AS n_orders FROM orders GROUP BY 1
        |), rich AS (
        |  SELECT c_custkey AS custkey, c_acctbal FROM customer WHERE c_acctbal > 9000
        |)
        |SELECT coalesce(wo.custkey, rich.custkey) AS custkey,
        |       coalesce(wo.n_orders, 0) AS n_orders,
        |       round(coalesce(rich.c_acctbal, -1.0), 2) AS acctbal
        |FROM wo FULL OUTER JOIN rich ON wo.custkey = rich.custkey
        |ORDER BY custkey""".stripMargin,
    "q_pivot" ->
      """SELECT source,
        |       count(CASE WHEN lang = 'de' THEN 1 END) AS de,
        |       count(CASE WHEN lang = 'en' THEN 1 END) AS en,
        |       count(CASE WHEN lang = 'es' THEN 1 END) AS es,
        |       count(CASE WHEN lang = 'fr' THEN 1 END) AS fr,
        |       count(CASE WHEN lang = 'zh' THEN 1 END) AS zh
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_intersect" ->
      """SELECT custkey FROM (
        |  (SELECT DISTINCT o_custkey AS custkey FROM orders)
        |  INTERSECT
        |  (SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
        |) t ORDER BY custkey""".stripMargin,
    "q_star_join" ->
      """SELECT n_name,
        |       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,12))) AS DOUBLE), 4) AS revenue,
        |       count(*) AS n_items
        |FROM region, nation, customer, orders, lineitem, supplier
        |WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
        |  AND s_nationkey = n_nationkey AND c_nationkey = s_nationkey
        |  AND o_custkey = c_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       round(CAST(sum(CAST(l_quantity AS DECIMAL(28,12))) AS DOUBLE), 4) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       round(CAST(sum(CAST(l_quantity AS DECIMAL(28,12))) AS DOUBLE), 4) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 4) AS med_value,
        |       round(quantile_cont(value, 0.9), 4) AS p90_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_asof_join" ->
      """WITH p AS (
        |  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
        |), v AS (
        |  SELECT user_id, ts, arg_max(value, event_id) AS v_value,
        |         max(event_id) AS v_event
        |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
        |)
        |SELECT p.user_id, p.event_id AS p_event, epoch_us(p.ts) AS p_ts_us,
        |       v.v_event, round(v.v_value, 4) AS v_value
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
        |ORDER BY p.user_id, p_event""".stripMargin,
    "q_sessionize" -> SessionizeOracle,
    // identical semantics by construction: the streaming session run
    // must converge to exactly the batch answer
    "q_stream_sessionize" -> SessionizeOracle,
    "q_range_join" -> RangeJoinOracle,
    // identical semantics by construction — the rule-driven naive join
    // must hash-match the explicit bucketized operator's oracle
    "q_range_join_rule" -> RangeJoinOracle,
    "q_window_running" ->
      """SELECT user_id, event_id,
        |       row_number() OVER w AS event_seq,
        |       round(CAST(sum(CAST(value AS DECIMAL(28,12))) OVER w AS DOUBLE), 4) AS running_value
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_seq""".stripMargin,
    // plain unsalted join: equality proves saltedJoin's row-identity
    "q_salted_join" ->
      """WITH dim(event_type, weight) AS (VALUES
        |  ('click', 1.0), ('error', 0.25), ('purchase', 10.0),
        |  ('signup', 5.0), ('view', 0.5))
        |SELECT e.event_type, count(*) AS n,
        |       round(CAST(sum(CAST(e.value * d.weight AS DECIMAL(28,12))) AS DOUBLE), 4)
        |         AS weighted_value
        |FROM events e JOIN dim d USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q_mm_resize" ->
      s"""WITH $MediaCte
         |SELECT media_id, kind, width, height,
         |       CASE WHEN greatest(width, height) > 128
         |            THEN CAST(floor(width * 128.0 / greatest(width, height)) AS INTEGER)
         |            ELSE width END AS out_w,
         |       CASE WHEN greatest(width, height) > 128
         |            THEN CAST(floor(height * 128.0 / greatest(width, height)) AS INTEGER)
         |            ELSE height END AS out_h
         |FROM media ORDER BY media_id""".stripMargin,
    "q_mm_frames" ->
      s"""WITH $MediaCte
         |SELECT media_id, n_frames, CAST(f AS INTEGER) AS frame_no
         |FROM media CROSS JOIN unnest(range(0, CAST(n_frames AS BIGINT), 7)) AS t(f)
         |WHERE kind = 'video'
         |ORDER BY media_id, frame_no""".stripMargin,
    "q_mm_decode_stub" ->
      """SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
        |       CAST(d AS INTEGER) AS d,
        |       round(CAST(('0x' || substring(md5(text || ':' || CAST(d AS VARCHAR)), 1, 6)) AS BIGINT)
        |             / 16777216.0, 6) AS f
        |FROM documents CROSS JOIN range(8) t(d)
        |ORDER BY media_id, d""".stripMargin,
    // codec-free recomputation of every decoded FRAME's luminance sum
    // straight from the per-frame formula (MultimodalOps.framePixel)
    "q_mm_video_real" ->
      """WITH meta AS (
        |  SELECT doc_id AS media_id,
        |         8 + (doc_id % 17) AS w, 8 + ((doc_id * 7) % 17) AS h,
        |         2 + ((doc_id * 13) % 5) AS nf
        |  FROM documents
        |)
        |SELECT media_id, CAST(f AS INTEGER) AS frame_no,
        |       CAST(w * h AS BIGINT) AS n_px,
        |       CAST(sum((7*x + 3*y + 11*f + (media_id % 256)) % 256) AS BIGINT) AS lum_sum
        |FROM meta CROSS JOIN range(7) fs(f)
        |  CROSS JOIN range(25) xs(x) CROSS JOIN range(25) ys(y)
        |WHERE f < nf AND x < w AND y < h
        |GROUP BY media_id, f, w, h
        |ORDER BY media_id, frame_no""".stripMargin,
    // codec-free recomputation of the decoded per-channel sums straight
    // from the deterministic pixel formula (MultimodalOps.pixelChannels)
    "q_mm_decode_real" ->
      """WITH meta AS (
        |  SELECT doc_id AS media_id,
        |         8 + (doc_id % 25) AS w, 8 + ((doc_id * 7) % 25) AS h
        |  FROM documents
        |)
        |SELECT media_id, CAST(w * h AS BIGINT) AS n_px,
        |       CAST(sum((7*x + 3*y + (media_id % 256)) % 256) AS BIGINT) AS r_sum,
        |       CAST(sum((5*x + 11*y + 2*(media_id % 256)) % 256) AS BIGINT) AS g_sum,
        |       CAST(sum((13*x + 17*y + 3*(media_id % 256)) % 256) AS BIGINT) AS b_sum
        |FROM meta CROSS JOIN range(33) xs(x) CROSS JOIN range(33) ys(y)
        |WHERE x < w AND y < h
        |GROUP BY media_id, w, h
        |ORDER BY media_id""".stripMargin,
    // perceptual-hash pairs: hash recomputed codec-free from the pixel
    // formula (integer cross-multiplied cell bits), quadratic
    // all-pairs Hamming scan — equality proves codec losslessness AND
    // pigeonhole completeness
    "q_mm_phash" ->
      """WITH meta AS (
        |  SELECT doc_id AS media_id,
        |         8 + (doc_id % 25) AS w, 8 + ((doc_id * 7) % 25) AS h
        |  FROM documents
        |), px AS (
        |  SELECT media_id, w, h, (y * 7) // h AS cy, (x * 8) // w AS cx,
        |         (7*x + 3*y + media_id % 256) % 256
        |           + (5*x + 11*y + 2*(media_id % 256)) % 256
        |           + (13*x + 17*y + 3*(media_id % 256)) % 256 AS l
        |  FROM meta CROSS JOIN range(33) xs(x) CROSS JOIN range(33) ys(y)
        |  WHERE x < w AND y < h
        |), cells AS (
        |  SELECT media_id, cy * 8 + cx AS c,
        |         CAST(sum(l) AS BIGINT) AS cs, count(*) AS cn
        |  FROM px GROUP BY media_id, cy, cx
        |), tots AS (
        |  SELECT media_id, CAST(sum(cs) AS BIGINT) AS tot,
        |         CAST(sum(cn) AS BIGINT) AS n
        |  FROM cells GROUP BY media_id
        |), sigs AS (
        |  SELECT c.media_id AS id,
        |         CAST(sum(CASE WHEN cs * t.n > t.tot * cn
        |                       THEN (1::BIGINT << CAST(c AS INTEGER))
        |                       ELSE 0 END) AS BIGINT) AS sig
        |  FROM cells c JOIN tots t USING (media_id) GROUP BY c.media_id
        |)
        |SELECT a.id AS id_a, b.id AS id_b,
        |       bit_count(xor(a.sig, b.sig)) AS hamming
        |FROM sigs a JOIN sigs b ON a.id < b.id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    // lossy tier: exact sums recomputed codec-free; TRUE = the decoded
    // means sat within tolerance (the certificate gate construction)
    "q_mm_jpeg" ->
      """WITH meta AS (
        |  SELECT doc_id AS media_id,
        |         8 + (doc_id % 25) AS w, 8 + ((doc_id * 7) % 25) AS h
        |  FROM documents
        |)
        |SELECT media_id, CAST(w * h AS BIGINT) AS n_px,
        |       CAST(sum((7*x + 3*y + (media_id % 256)) % 256) AS BIGINT) AS r_sum,
        |       CAST(sum((5*x + 11*y + 2*(media_id % 256)) % 256) AS BIGINT) AS g_sum,
        |       CAST(sum((13*x + 17*y + 3*(media_id % 256)) % 256) AS BIGINT) AS b_sum,
        |       TRUE AS within_tol
        |FROM meta CROSS JOIN range(33) xs(x) CROSS JOIN range(33) ys(y)
        |WHERE x < w AND y < h
        |GROUP BY media_id, w, h
        |ORDER BY media_id""".stripMargin,
    // codec-free recomputation of the decoded per-channel sample sums
    // straight from the PCM formula (MultimodalOps.sampleValue)
    "q_mm_audio_real" ->
      """WITH meta AS (
        |  SELECT doc_id AS media_id, 64 + (doc_id % 441) AS n FROM documents
        |)
        |SELECT media_id, CAST(n AS BIGINT) AS n_frames,
        |       CAST(sum(((31*i + (media_id % 65536)) % 65536) - 32768) AS BIGINT) AS l_sum,
        |       CAST(sum(((31*i + 7 + (media_id % 65536)) % 65536) - 32768) AS BIGINT) AS r_sum
        |FROM meta CROSS JOIN range(504) t(i)
        |WHERE i < n
        |GROUP BY media_id, n
        |ORDER BY media_id""".stripMargin,
    "q_stream_welford" ->
      s"""SELECT event_type, count(*) AS n, ${decMeanSql("value")} AS mean_value,
         |       round(stddev_pop(value), 4) AS std_value
         |FROM events WHERE (user_id * 2654435761) % 16 = 3
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the streamed dedup must converge to batch DISTINCT on digests
    "q_stream_dedup" ->
      """SELECT DISTINCT md5(text) AS text_hash FROM documents
        |ORDER BY text_hash""".stripMargin,
    // batch inequality-join truth for the stream-stream interval join
    "q_stream_interval_join" ->
      """WITH p AS (
        |  SELECT user_id, ts AS p_ts, event_id AS p_event
        |  FROM events WHERE event_type = 'purchase'
        |), v AS (
        |  SELECT user_id, ts AS v_ts, event_id AS v_event, value AS v_value
        |  FROM events WHERE event_type = 'view'
        |)
        |SELECT p.user_id, p.p_event, epoch_us(p.p_ts) AS p_ts_us,
        |       v.v_event, round(v.v_value, 4) AS v_value
        |FROM p JOIN v ON p.user_id = v.user_id
        |  AND v.v_ts <= p.p_ts
        |  AND v.v_ts >= p.p_ts - INTERVAL 24 HOUR
        |ORDER BY p.user_id, p.p_event, v.v_event""".stripMargin,
    // codec-free elementwise recomputation over the 64 dims
    "q_centroids" ->
      """SELECT label, count(*) AS n, CAST(d AS INTEGER) AS d,
        |       round(CAST(sum(CAST(CAST(embedding[d+1] AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
        |             / count(*), 6) AS c
        |FROM embeddings CROSS JOIN range(64) r(d)
        |GROUP BY label, d
        |ORDER BY label, d""".stripMargin,
    // Student-t two-sided p-values, fully SQL: for INTEGER df the t-CDF
    // is an elementary finite sum (Abramowitz & Stegun 26.7.3/4), so a
    // recursive CTE evaluates it EXACTLY — same quantity commons-math
    // computes via the regularized incomplete beta, agreeing to ~1e-12.
    // θ = atan(|t|/√ν); odd ν: A = 2/π·(θ + sinθ·Σ c_j cos^{2j+1}θ);
    // even ν: A = sinθ·Σ d_j cos^{2j}θ; p = 1 − A. The shared term
    // recurrence is term *= cos²θ·(e−1)/e stepping the exponent e by 2.
    "q_reg_pvalues" ->
      s"""${RegObsCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |st AS (
         |  SELECT word, count(*) AS n, corr(x, y) AS ry1, corr(c, y) AS ry2,
         |         corr(x, c) AS r12
         |  FROM dense GROUP BY word
         |), ts AS (
         |  SELECT word, CAST(n - 3 AS BIGINT) AS nu,
         |         ((ry1 - ry2 * r12) / (1 - r12 * r12))
         |           * sqrt((n - 3) * (1 - r12 * r12)
         |                  / (1 - (ry1*ry1 + ry2*ry2 - 2*ry1*ry2*r12) / (1 - r12*r12))) AS t1
         |  FROM st
         |), pv AS (
         |  SELECT word, nu, t1, atan(abs(t1) / sqrt(CAST(nu AS DOUBLE))) AS theta
         |  FROM ts
         |), ser AS (
         |  SELECT word, nu, theta, cos(theta) * cos(theta) AS c2,
         |         CAST(CASE WHEN nu % 2 = 1 THEN 1 ELSE 0 END AS BIGINT) AS e,
         |         CASE WHEN nu % 2 = 1 THEN cos(theta) ELSE 1.0 END AS term,
         |         CASE WHEN nu % 2 = 1 THEN (CASE WHEN nu >= 3 THEN cos(theta) ELSE 0.0 END)
         |              ELSE 1.0 END AS acc
         |  FROM pv
         |  UNION ALL
         |  SELECT word, nu, theta, c2, e + 2,
         |         term * c2 * (e + 1) / (e + 2),
         |         acc + term * c2 * (e + 1) / (e + 2)
         |  FROM ser WHERE e + 2 <= nu - 2
         |), tail AS (
         |  SELECT word, arg_max(acc, e) AS s, any_value(nu) AS nu,
         |         any_value(theta) AS theta
         |  FROM ser GROUP BY word
         |), pfin AS (
         |  SELECT t.word, t.t1,
         |         1.0 - (CASE WHEN f.nu % 2 = 1
         |                     THEN 2.0 / pi() * (f.theta + sin(f.theta) * f.s)
         |                     ELSE sin(f.theta) * f.s END) AS p1
         |  FROM ts t JOIN tail f ON f.word = t.word
         |)
         |SELECT word, round(t1, 6) AS t1, round(p1, 6) AS p1,
         |       round(least(p1 * 20, 1.0), 6) AS p1_bonf
         |FROM pfin ORDER BY word""".stripMargin,
    // The LSH candidates provably contain the exact top-10 at this
    // corpus (16 tables × 6 bits × radius-2 probing; recall floor also
    // unit-gated), so the oracle is the SAME exact top-k as q_cosine_nn:
    // hash equality certifies both ranking and recall.
    "q_ann_lsh" ->
      s"""WITH $CosineCte,
         |dots AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS nn_id, ${DotSql("q", "c")} AS dot
         |  FROM v q JOIN v c ON c.vec_id <> q.vec_id, range(64) r(d)
         |  WHERE q.vec_id < 10
         |  GROUP BY q.vec_id, c.vec_id
         |), sims AS (
         |  SELECT d.q_id, d.nn_id, d.dot / (nq.nrm * nc.nrm) AS sim
         |  FROM dots d JOIN nrm nq ON nq.vec_id = d.q_id
         |  JOIN nrm nc ON nc.vec_id = d.nn_id
         |)
         |SELECT q_id, nn_id, round(sim, 6) AS sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |                               ORDER BY sim DESC, nn_id) AS rank
         |  FROM sims) x
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    // IVF candidates at nProbe = nCells = 8 provably contain the exact
    // top-10 (every cell probed — the containment point on this
    // near-orthogonal corpus), so the oracle is the SAME exact top-k as
    // q_cosine_nn / q_ann_lsh: hash equality certifies the KMeans
    // fit→assign→probe→rank pipeline end to end (equality also pinned
    // in AnnExactRecallSpec at sf0.001 + sf0.01).
    "q_ann_ivf" ->
      s"""WITH $CosineCte,
         |dots AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS nn_id, ${DotSql("q", "c")} AS dot
         |  FROM v q JOIN v c ON c.vec_id <> q.vec_id, range(64) r(d)
         |  WHERE q.vec_id < 10
         |  GROUP BY q.vec_id, c.vec_id
         |), sims AS (
         |  SELECT d.q_id, d.nn_id, d.dot / (nq.nrm * nc.nrm) AS sim
         |  FROM dots d JOIN nrm nq ON nq.vec_id = d.q_id
         |  JOIN nrm nc ON nc.vec_id = d.nn_id
         |)
         |SELECT q_id, nn_id, round(sim, 6) AS sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |                               ORDER BY sim DESC, nn_id) AS rank
         |  FROM sims) x
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    // PQ certificate: the oracle recomputes the exact L2 nearest
    // neighbor (decimal-summed squared distance, the engine re-rank's
    // own arithmetic) and contributes literal TRUE for the recall
    // bound — hash equality proves the exact anchor AND the
    // engine-measured recall@10 >= 0.5 per query
    "q_ann_pq" ->
      """WITH v AS (SELECT vec_id, embedding FROM embeddings),
        |d2 AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS nn_id,
        |         CAST(sum(CAST(
        |           (CAST(q.embedding[d+1] AS DOUBLE) - CAST(c.embedding[d+1] AS DOUBLE)) *
        |           (CAST(q.embedding[d+1] AS DOUBLE) - CAST(c.embedding[d+1] AS DOUBLE))
        |           AS DECIMAL(38,12))) AS DOUBLE) AS dist2
        |  FROM v q JOIN v c ON c.vec_id <> q.vec_id, range(64) r(d)
        |  WHERE q.vec_id < 10
        |  GROUP BY 1, 2
        |), rk AS (
        |  SELECT q_id, nn_id, dist2,
        |         row_number() OVER (PARTITION BY q_id
        |                            ORDER BY dist2, nn_id) AS rank
        |  FROM d2
        |)
        |SELECT q_id, nn_id AS exact_nn_id, round(dist2, 6) AS exact_nn_dist2,
        |       TRUE AS pq_ok
        |FROM rk WHERE rank = 1 ORDER BY q_id""".stripMargin,
    // Logistic GD replay: 3 unrolled rounds, each a MATERIALIZED
    // gradient CTE + β CTE mirroring the engine's exact expression
    // shapes (9-dp σ/terms, decimal sums, 9-dp β re-round)
    "q_logreg_gd" ->
      """WITH f AS MATERIALIZED (
        |  SELECT CAST(len(list_filter(ws, t -> t IN ('the','and','of','to','a'))) AS DOUBLE)
        |           / CAST(len(ws) AS DOUBLE) AS x1,
        |         CAST(len(ws) AS DOUBLE) / 100.0 AS x2,
        |         CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
        |              ELSE CAST(0.0 AS DOUBLE) END AS y
        |  FROM (SELECT lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        |        FROM documents) t
        |  WHERE len(ws) > 0
        |), g1 AS MATERIALIZED (
        |  SELECT CAST(sum(CAST(round(sig - y, 9) AS DECIMAL(28,12))) AS DOUBLE) AS s0,
        |         CAST(sum(CAST(round((sig - y) * x1, 9) AS DECIMAL(28,12))) AS DOUBLE) AS s1,
        |         CAST(sum(CAST(round((sig - y) * x2, 9) AS DECIMAL(28,12))) AS DOUBLE) AS s2,
        |         count(*) AS n
        |  FROM (SELECT x1, x2, y,
        |          round(1.0 / (1.0 + exp(-(0.0 + 0.0 * x1 + 0.0 * x2))), 9) AS sig
        |        FROM f) r
        |), b1 AS MATERIALIZED (
        |  SELECT round(0.0 - 0.5 * (s0 / n), 9) AS b0,
        |         round(0.0 - 0.5 * (s1 / n), 9) AS b1v,
        |         round(0.0 - 0.5 * (s2 / n), 9) AS b2v FROM g1
        |), g2 AS MATERIALIZED (
        |  SELECT CAST(sum(CAST(round(sig - y, 9) AS DECIMAL(28,12))) AS DOUBLE) AS s0,
        |         CAST(sum(CAST(round((sig - y) * x1, 9) AS DECIMAL(28,12))) AS DOUBLE) AS s1,
        |         CAST(sum(CAST(round((sig - y) * x2, 9) AS DECIMAL(28,12))) AS DOUBLE) AS s2,
        |         count(*) AS n
        |  FROM (SELECT f.x1, f.x2, f.y,
        |          round(1.0 / (1.0 + exp(-(b.b0 + b.b1v * f.x1 + b.b2v * f.x2))), 9) AS sig
        |        FROM f, b1 b) r
        |), b2 AS MATERIALIZED (
        |  SELECT round(b.b0 - 0.5 * (g.s0 / g.n), 9) AS b0,
        |         round(b.b1v - 0.5 * (g.s1 / g.n), 9) AS b1v,
        |         round(b.b2v - 0.5 * (g.s2 / g.n), 9) AS b2v FROM g2 g, b1 b
        |), g3 AS MATERIALIZED (
        |  SELECT CAST(sum(CAST(round(sig - y, 9) AS DECIMAL(28,12))) AS DOUBLE) AS s0,
        |         CAST(sum(CAST(round((sig - y) * x1, 9) AS DECIMAL(28,12))) AS DOUBLE) AS s1,
        |         CAST(sum(CAST(round((sig - y) * x2, 9) AS DECIMAL(28,12))) AS DOUBLE) AS s2,
        |         count(*) AS n
        |  FROM (SELECT f.x1, f.x2, f.y,
        |          round(1.0 / (1.0 + exp(-(b.b0 + b.b1v * f.x1 + b.b2v * f.x2))), 9) AS sig
        |        FROM f, b2 b) r
        |), b3 AS MATERIALIZED (
        |  SELECT round(b.b0 - 0.5 * (g.s0 / g.n), 9) AS b0,
        |         round(b.b1v - 0.5 * (g.s1 / g.n), 9) AS b1v,
        |         round(b.b2v - 0.5 * (g.s2 / g.n), 9) AS b2v FROM g3 g, b2 b
        |), acc AS (
        |  SELECT sum(CASE WHEN ((b.b0 + b.b1v * f.x1 + b.b2v * f.x2) > 0.0) = (f.y = 1.0)
        |                  THEN 1 ELSE 0 END) AS nc, count(*) AS n
        |  FROM f, b3 b
        |)
        |SELECT metric, value FROM (
        |  SELECT 'b0' AS metric, b0 AS value FROM b3
        |  UNION ALL SELECT 'b1', b1v FROM b3
        |  UNION ALL SELECT 'b2', b2v FROM b3
        |  UNION ALL SELECT 'n_correct', CAST(nc AS DOUBLE) FROM acc
        |  UNION ALL SELECT 'n_docs', CAST(n AS DOUBLE) FROM acc
        |  UNION ALL SELECT 'accuracy', CAST(nc AS DOUBLE) / CAST(n AS DOUBLE) FROM acc
        |) u ORDER BY metric""".stripMargin,
    // Momentum GD run to convergence = standardized OLS, closed-form
    // from pairwise correlations (intercept is exactly 0 in z-space).
    "q_momentum_gd" ->
      """WITH st AS (
        |  SELECT corr(l_quantity, l_extendedprice) AS ry1,
        |         corr(l_discount, l_extendedprice) AS ry2,
        |         corr(l_quantity, l_discount) AS r12
        |  FROM lineitem
        |)
        |SELECT coef, round(value, 6) AS value FROM (
        |  SELECT 'beta_x1' AS coef, (ry1 - ry2 * r12) / (1 - r12 * r12) AS value FROM st
        |  UNION ALL
        |  SELECT 'beta_x2', (ry2 - ry1 * r12) / (1 - r12 * r12) FROM st
        |  UNION ALL
        |  SELECT 'intercept', 0.0 FROM st
        |) t ORDER BY coef""".stripMargin,
    "q_cosine_neardup" ->
      s"""WITH $CosineCte,
         |dots AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb, ${DotSql("a", "b")} AS dot
         |  FROM v a JOIN v b ON a.vec_id < b.vec_id, range(64) r(d)
         |  GROUP BY a.vec_id, b.vec_id
         |)
         |SELECT d.va, d.vb, round(d.dot / (na.nrm * nb.nrm), 6) AS sim
         |FROM dots d JOIN nrm na ON na.vec_id = d.va
         |JOIN nrm nb ON nb.vec_id = d.vb
         |WHERE d.dot / (na.nrm * nb.nrm) >= 0.4
         |ORDER BY d.va, d.vb""".stripMargin,
    // MMR replay: candidate lists + pair sims at their published 6-dp
    // values, greedy rounds unrolled with the same argmax/tie order
    "q_mmr" ->
      s"""WITH $CosineCte,
         |dots AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS nn_id, ${DotSql("q", "c")} AS dot
         |  FROM v q JOIN v c ON c.vec_id <> q.vec_id, range(64) r(d)
         |  WHERE q.vec_id < 10
         |  GROUP BY q.vec_id, c.vec_id
         |), cand AS MATERIALIZED (
         |  SELECT q_id, nn_id, round(sim, 6) AS rel FROM (
         |    SELECT q_id, nn_id, sim, row_number() OVER (PARTITION BY q_id
         |             ORDER BY sim DESC, nn_id) AS rank FROM (
         |      SELECT d.q_id, d.nn_id, d.dot / (nq.nrm * nc.nrm) AS sim
         |      FROM dots d JOIN nrm nq ON nq.vec_id = d.q_id
         |      JOIN nrm nc ON nc.vec_id = d.nn_id)) x
         |  WHERE rank <= 10
         |), cp AS (
         |  SELECT DISTINCT c1.nn_id AS a, c2.nn_id AS b
         |  FROM cand c1 JOIN cand c2
         |    ON c1.q_id = c2.q_id AND c1.nn_id <> c2.nn_id
         |), pd AS MATERIALIZED (
         |  SELECT p.a, p.b,
         |    CAST(sum(CAST(CAST(va.embedding[d+1] AS DOUBLE)
         |         * CAST(vb.embedding[d+1] AS DOUBLE)
         |         AS DECIMAL(38,18))) AS DOUBLE) AS dot
         |  FROM cp p JOIN v va ON va.vec_id = p.a
         |  JOIN v vb ON vb.vec_id = p.b, range(64) r(d)
         |  GROUP BY p.a, p.b
         |), ps AS MATERIALIZED (
         |  SELECT c1.q_id, c1.nn_id AS a, c2.nn_id AS b,
         |         round(pd.dot / (na.nrm * nb.nrm), 6) AS s
         |  FROM cand c1 JOIN cand c2
         |    ON c1.q_id = c2.q_id AND c1.nn_id <> c2.nn_id
         |  JOIN pd ON pd.a = c1.nn_id AND pd.b = c2.nn_id
         |  JOIN nrm na ON na.vec_id = c1.nn_id
         |  JOIN nrm nb ON nb.vec_id = c2.nn_id
         |), a1 AS MATERIALIZED (
         |  SELECT q_id, nn_id, 1 AS mmr_rank, score FROM (
         |    SELECT q_id, nn_id, CAST(0.7 AS DOUBLE) * rel AS score,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY CAST(0.7 AS DOUBLE) * rel DESC, nn_id) AS rk
         |    FROM cand) x WHERE rk = 1
         |),
         |${mmrRoundsSql(5)}
         |SELECT q_id, mmr_rank, nn_id, score
         |FROM a5 ORDER BY q_id, mmr_rank""".stripMargin,
    // SemDeDup full replay: the q_kmeans Lloyd chain (shared CTEs)
    // assigns clusters, then cosine only WITHIN a cluster (va < vb),
    // drop rule = smallest qualifying earlier neighbor, plus a
    // per-cluster (n, n_kept) summary row
    "q_semdedup" ->
      s"""WITH ${kmeansCtes(dims = 8, k = 4, iters = 2)},
         |nrmv AS MATERIALIZED (
         |  SELECT vec_id, sqrt(CAST(sum(CAST(CAST(embedding[d+1] AS DOUBLE)
         |         * CAST(embedding[d+1] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
         |  FROM embeddings, range(64) r(d) GROUP BY vec_id
         |), pv AS MATERIALIZED (
         |  SELECT g.cluster, e.vec_id, e.embedding
         |  FROM asg g JOIN embeddings e ON e.vec_id = g.vec_id
         |), dots AS (
         |  SELECT a.cluster, a.vec_id AS va, b.vec_id AS vb, ${DotSql("a", "b")} AS dot
         |  FROM pv a JOIN pv b ON b.cluster = a.cluster AND a.vec_id < b.vec_id,
         |       range(64) r(d)
         |  GROUP BY a.cluster, a.vec_id, b.vec_id
         |), pairs AS MATERIALIZED (
         |  SELECT d.cluster, d.va, d.vb, d.dot / (na.nrm * nb.nrm) AS sim
         |  FROM dots d JOIN nrmv na ON na.vec_id = d.va
         |  JOIN nrmv nb ON nb.vec_id = d.vb
         |  WHERE d.dot / (na.nrm * nb.nrm) >= 0.4
         |), dropped AS MATERIALIZED (
         |  SELECT cluster, vb, min(va) AS dup_of FROM pairs GROUP BY 1, 2
         |), detail AS (
         |  SELECT d.cluster, d.vb AS vec_id, d.dup_of, round(p.sim, 6) AS sim,
         |         CAST(NULL AS BIGINT) AS n, CAST(NULL AS BIGINT) AS n_kept
         |  FROM dropped d JOIN pairs p ON p.vb = d.vb AND p.va = d.dup_of
         |), sizes AS (SELECT cluster, count(*) AS n FROM pv GROUP BY 1),
         |dcnt AS (SELECT cluster, count(*) AS nd FROM dropped GROUP BY 1)
         |SELECT * FROM detail
         |UNION ALL
         |SELECT s.cluster, CAST(NULL AS BIGINT) AS vec_id,
         |       CAST(NULL AS BIGINT) AS dup_of, CAST(NULL AS DOUBLE) AS sim,
         |       s.n, s.n - coalesce(d.nd, 0) AS n_kept
         |FROM sizes s LEFT JOIN dcnt d ON d.cluster = s.cluster
         |ORDER BY cluster, vec_id ASC NULLS LAST, dup_of ASC NULLS LAST""".stripMargin,
    // exact all-pairs eval×train cross join — equality proves the LSH
    // candidate stage missed nothing (recall certificate)
    "q_semantic_decontam" ->
      s"""WITH $CosineCte,
         |dots AS (
         |  SELECT e.vec_id AS eval_id, t.vec_id AS train_id, ${DotSql("e", "t")} AS dot
         |  FROM v e JOIN v t ON e.vec_id % 5 = 0 AND t.vec_id % 5 <> 0, range(64) r(d)
         |  GROUP BY e.vec_id, t.vec_id
         |)
         |SELECT d.eval_id, d.train_id, round(d.dot / (ne.nrm * nt.nrm), 6) AS sim
         |FROM dots d JOIN nrm ne ON ne.vec_id = d.eval_id
         |JOIN nrm nt ON nt.vec_id = d.train_id
         |WHERE d.dot / (ne.nrm * nt.nrm) >= 0.4
         |ORDER BY d.eval_id, d.train_id""".stripMargin,
    // tie-aware Mann–Whitney AUC replay: BIGINT mid-rank arithmetic,
    // one final exact-int division per published rate
    // WoE/IV replay: one ln per bin on exact-int cross-ratios, 9-dp
    // terms, decimal IV total
    "q_woe_iv" ->
      """WITH c AS (
        |  SELECT least(n_chars // 100, 9) AS bin,
        |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents
        |), agg AS (
        |  SELECT bin, CAST(sum(y) AS BIGINT) AS g,
        |         CAST(count(*) - sum(y) AS BIGINT) AS b
        |  FROM c GROUP BY bin
        |), tot AS (
        |  SELECT CAST(sum(g) AS BIGINT) AS gt, CAST(sum(b) AS BIGINT) AS bt,
        |         CAST(count(*) AS BIGINT) AS k
        |  FROM agg
        |), pb AS (
        |  SELECT bin, g, b,
        |    round(ln(CAST((g + 1) * (bt + k) AS DOUBLE)
        |             / CAST((b + 1) * (gt + k) AS DOUBLE)), 9) AS woe9,
        |    round((CAST(g + 1 AS DOUBLE) / (gt + k)
        |           - CAST(b + 1 AS DOUBLE) / (bt + k))
        |          * round(ln(CAST((g + 1) * (bt + k) AS DOUBLE)
        |                     / CAST((b + 1) * (gt + k) AS DOUBLE)), 9), 9) AS iv9
        |  FROM agg CROSS JOIN tot
        |)
        |SELECT bin, g, b, round(woe9, 6) + 0.0 AS woe,
        |       round(iv9, 6) + 0.0 AS iv_term
        |FROM pb
        |UNION ALL
        |SELECT CAST(NULL AS BIGINT), CAST(sum(g) AS BIGINT),
        |       CAST(sum(b) AS BIGINT), CAST(NULL AS DOUBLE),
        |       round(CAST(sum(CAST(iv9 AS DECIMAL(38,12))) AS DOUBLE), 6) + 0.0
        |FROM pb
        |ORDER BY bin NULLS LAST""".stripMargin,
    // LOO replay: decimal sum minus the row's own decimal cast — the
    // numerator is exactly the other rows' sum; singleton keys NULL
    "q_target_encode" ->
      """WITH b AS (
        |  SELECT event_id AS id, event_type AS k, CAST(value AS DOUBLE) AS t
        |  FROM events
        |), a AS (
        |  SELECT k, sum(CAST(t AS DECIMAL(38,12))) AS s,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM b GROUP BY k
        |)
        |SELECT b.id, b.k, b.t,
        |       CASE WHEN a.n > 1
        |            THEN round(CAST(a.s - CAST(b.t AS DECIMAL(38,12)) AS DOUBLE)
        |                       / (a.n - 1), 6) END AS loo
        |FROM b JOIN a USING (k) WHERE b.id < 5000 ORDER BY b.id""".stripMargin,
    // Fleiss replay: exact-int P̄, 9-dp decimal-summed P̄e, one IEEE
    // dag for kappa; raters = gold + NB replay + langId replay
    "q_fleiss" ->
      s"""WITH $LangCtes,
         |nb AS ($NaiveBayesOracle),
         |rat AS (
         |  SELECT doc_id AS i, true_label AS j FROM nb
         |  UNION ALL SELECT doc_id, pred_label FROM nb
         |  UNION ALL SELECT d.doc_id, coalesce(bt.lang, 'und')
         |  FROM documents d LEFT JOIN best bt USING (doc_id)
         |  WHERE d.doc_id % 5 = 0
         |), nij AS (
         |  SELECT i, j, CAST(count(*) AS BIGINT) AS n FROM rat GROUP BY i, j
         |), pitem AS (
         |  SELECT i, CAST(sum(n * n) AS BIGINT) AS s2 FROM nij GROUP BY i
         |), ntot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS nn,
         |         CAST(sum(s2 - 3) AS BIGINT) AS sp
         |  FROM pitem
         |), pj AS (SELECT j, CAST(sum(n) AS BIGINT) AS cj FROM nij GROUP BY j),
         |cat AS (
         |  SELECT j AS label, cj, CAST(cj AS DOUBLE) / (nn * 3) AS p
         |  FROM pj CROSS JOIN ntot
         |), pe AS (
         |  SELECT CAST(sum(CAST(round(p * p, 9) AS DECIMAL(38,12))) AS DOUBLE)
         |         AS ped
         |  FROM cat
         |), allr AS (
         |  SELECT 'ALL' AS label, nn AS n, CAST(NULL AS DOUBLE) AS p,
         |         CAST(sp AS DOUBLE) / (nn * 6) AS pbar, ped AS pe
         |  FROM ntot CROSS JOIN pe
         |)
         |SELECT label, cj AS n, round(p, 6) AS p, CAST(NULL AS DOUBLE) AS pbar,
         |       CAST(NULL AS DOUBLE) AS pe, CAST(NULL AS DOUBLE) AS kappa
         |FROM cat
         |UNION ALL
         |SELECT label, n, p, round(pbar, 6), round(pe, 6),
         |       CASE WHEN pe < 1.0
         |            THEN round((pbar - pe) / (1.0 - pe), 6) + 0.0 END
         |FROM allr
         |ORDER BY label""".stripMargin,
    // path replay: same two leads under the same total order, support
    // + rank; rk CAST to INTEGER (Spark row_number is int)
    "q_path3" ->
      """WITH seq AS (
        |  SELECT event_type AS t1,
        |         lead(event_type, 1) OVER w AS t2,
        |         lead(event_type, 2) OVER w AS t3
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), p AS (
        |  SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE t3 IS NOT NULL GROUP BY 1, 2, 3
        |  HAVING count(*) >= 5
        |)
        |SELECT t1, t2, t3, n,
        |       CAST(row_number() OVER (ORDER BY n DESC, t1, t2, t3) AS INTEGER)
        |         AS rk
        |FROM p ORDER BY rk""".stripMargin,
    // BT replay: exact-int pair matrix; each MM round re-derives the
    // 9dp/decimal-sum update; round CTEs MATERIALIZED (branching > 1)
    "q_bradley_terry" ->
      s"""WITH seq AS (
         |  SELECT user_id, event_type AS t1, value AS v1,
         |         lead(event_type) OVER w AS t2, lead(value) OVER w AS v2
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), pr AS (
         |  SELECT CASE WHEN v1 > v2 THEN t1 ELSE t2 END AS winner,
         |         CASE WHEN v1 > v2 THEN t2 ELSE t1 END AS loser
         |  FROM seq WHERE t2 IS NOT NULL AND t1 <> t2 AND v1 <> v2
         |), wl AS (
         |  SELECT winner, loser, CAST(count(*) AS BIGINT) AS c
         |  FROM pr GROUP BY 1, 2
         |), sym AS (
         |  SELECT i, j, CAST(sum(w) AS BIGINT) AS w, CAST(sum(n) AS BIGINT) AS n
         |  FROM (
         |    SELECT winner AS i, loser AS j, c AS w, c AS n FROM wl
         |    UNION ALL
         |    SELECT loser AS i, winner AS j, 0 AS w, c AS n FROM wl) u
         |  GROUP BY i, j
         |), tot AS (
         |  SELECT i, CAST(sum(w) AS BIGINT) AS wins,
         |         CAST(sum(n) AS BIGINT) AS n_comps
         |  FROM sym GROUP BY i
         |), p0 AS (SELECT i, CAST(1.0 AS DOUBLE) AS p FROM tot),
         |${btRoundsSql(5)}
         |SELECT t.i AS item, t.n_comps, t.wins, round(p.p, 6) AS strength
         |FROM tot t JOIN p5 p ON p.i = t.i ORDER BY item""".stripMargin,
    // KM replay: exact-int risk/death counts, 9-dp ln factors
    // decimal-cumulated in lifetime order, exp published at 6dp
    "q_km_survival" ->
      """WITH pu AS (
        |  SELECT user_id, min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
        |  FROM events GROUP BY user_id
        |), h AS (SELECT max(epoch_us(ts)) AS h_us FROM events),
        |lives AS (
        |  SELECT (last_us - first_us) // 21600000000 AS t,
        |         h.h_us - last_us < 21600000000 AS censored
        |  FROM pu CROSS JOIN h
        |), byt AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS ended,
        |         CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT) AS d,
        |         CAST(sum(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM lives GROUP BY t
        |), r AS (
        |  SELECT *, CAST(sum(ended) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk
        |  FROM byt
        |), s AS (
        |  SELECT *,
        |    sum(CAST(CASE WHEN d > 0 AND n_risk > d
        |             THEN round(ln(CAST(n_risk - d AS DOUBLE) / n_risk), 9)
        |             ELSE 0.0 END AS DECIMAL(38,12))) OVER (ORDER BY t) AS cum_ln,
        |    sum(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t) AS zeroed
        |  FROM r
        |)
        |SELECT t, n_risk, d, c,
        |       round(CAST(d AS DOUBLE) / n_risk, 6) AS hazard,
        |       CASE WHEN zeroed > 0 THEN 0.0
        |            ELSE round(exp(CAST(cum_ln AS DOUBLE)), 6) END AS survival
        |FROM s ORDER BY t""".stripMargin,
    // Welch replay: same decimal accumulators, same IEEE dag for t
    // and the Satterthwaite df; flag decided on the published t
    "q_welch_t" ->
      """WITH c AS (
        |  SELECT event_type AS grp, user_id % 2 AS v, CAST(value AS DOUBLE) AS x
        |  FROM events
        |), a AS (
        |  SELECT grp,
        |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    sum(CASE WHEN v = 0 THEN CAST(x AS DECIMAL(38,12))
        |             ELSE CAST(0 AS DECIMAL(38,12)) END) AS s0,
        |    sum(CASE WHEN v = 0 THEN CAST(x * x AS DECIMAL(38,12))
        |             ELSE CAST(0 AS DECIMAL(38,12)) END) AS q0,
        |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    sum(CASE WHEN v = 1 THEN CAST(x AS DECIMAL(38,12))
        |             ELSE CAST(0 AS DECIMAL(38,12)) END) AS s1,
        |    sum(CASE WHEN v = 1 THEN CAST(x * x AS DECIMAL(38,12))
        |             ELSE CAST(0 AS DECIMAL(38,12)) END) AS q1
        |  FROM c GROUP BY grp
        |), m AS (
        |  SELECT grp, n0, n1,
        |    CAST(s0 AS DOUBLE) / n0 AS m0, CAST(s1 AS DOUBLE) / n1 AS m1,
        |    (CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / n0)
        |      / (n0 - 1) AS v0,
        |    (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
        |      / (n1 - 1) AS v1
        |  FROM a
        |), z AS (
        |  SELECT grp, n0, n1, round(m0, 6) AS mean0, round(m1, 6) AS mean1,
        |    CASE WHEN n0 > 1 AND n1 > 1 AND v0 / n0 + v1 / n1 > 0
        |         THEN round((m1 - m0) / sqrt(v0 / n0 + v1 / n1), 6) + 0.0 END AS t,
        |    CASE WHEN n0 > 1 AND n1 > 1 AND v0 / n0 + v1 / n1 > 0
        |         THEN round((v0 / n0 + v1 / n1) * (v0 / n0 + v1 / n1)
        |              / (v0 * v0 / (n0 * n0 * (n0 - 1))
        |                 + v1 * v1 / (n1 * n1 * (n1 - 1))), 6) END AS df
        |  FROM m
        |)
        |SELECT grp, n0, n1, mean0, mean1, t, df,
        |       coalesce(abs(t) > 1.96, FALSE) AS significant
        |FROM z ORDER BY grp""".stripMargin,
    // A/B replay: same four counters, same pooled-z double dag;
    // DuckDB sums CAST to BIGINT, flag decided on the published z
    "q_ab_test" ->
      """WITH c AS (
        |  SELECT event_type AS grp, user_id % 2 AS v,
        |         CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS s
        |  FROM events
        |), agg AS (
        |  SELECT grp,
        |         CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |         CAST(sum(CASE WHEN v = 0 THEN s ELSE 0 END) AS BIGINT) AS s0,
        |         CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |         CAST(sum(CASE WHEN v = 1 THEN s ELSE 0 END) AS BIGINT) AS s1
        |  FROM c GROUP BY grp
        |), m AS (
        |  SELECT grp, n0, s0, n1, s1,
        |         CAST(s0 AS DOUBLE) / n0 AS p0, CAST(s1 AS DOUBLE) / n1 AS p1,
        |         CAST(s0 + s1 AS DOUBLE) / (n0 + n1) AS pp
        |  FROM agg
        |), z AS (
        |  SELECT grp, n0, s0, n1, s1,
        |         CASE WHEN n0 > 0 AND n1 > 0
        |                   AND sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1)) > 0
        |              THEN round((p1 - p0)
        |                / sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1)), 6) + 0.0
        |              END AS z
        |  FROM m
        |)
        |SELECT grp, n0, s0, n1, s1, z,
        |       coalesce(abs(z) > 1.96, FALSE) AS significant
        |FROM z ORDER BY grp""".stripMargin,
    "q_roc_auc" ->
      """WITH lab AS (
        |  SELECT n_chars // 16 AS score,
        |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents
        |), bys AS (
        |  SELECT score, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos
        |  FROM lab GROUP BY score
        |), rk AS (
        |  SELECT score, n, n_pos,
        |         CAST(sum(n) OVER (ORDER BY score) AS BIGINT) AS cum_le,
        |         CAST(sum(n_pos) OVER (ORDER BY score DESC) AS BIGINT) AS cum_tp,
        |         CAST(sum(n - n_pos) OVER (ORDER BY score DESC) AS BIGINT) AS cum_fp
        |  FROM bys
        |), tot AS (
        |  SELECT CAST(sum(n_pos) AS BIGINT) AS p_tot,
        |         CAST(sum(n - n_pos) AS BIGINT) AS n_tot,
        |         CAST(sum(n_pos * (2 * (cum_le - n) + n + 1)) AS BIGINT) AS s2
        |  FROM rk
        |)
        |SELECT score, n, n_pos, cum_tp, cum_fp,
        |       round(CAST(cum_tp AS DOUBLE) / CAST(p_tot AS DOUBLE), 9) AS tpr,
        |       round(CAST(cum_fp AS DOUBLE) / CAST(n_tot AS DOUBLE), 9) AS fpr,
        |       round(CAST(s2 - p_tot * (p_tot + 1) AS DOUBLE)
        |             / CAST(2 * p_tot * n_tot AS DOUBLE), 9) AS auc
        |FROM rk, tot ORDER BY score""".stripMargin,
    // reliability-bin replay: 9-dp conf ratios, decimal bin sums, ECE
    // from the published rounded acc/avg_conf gaps
    "q_calibration" ->
      """WITH t AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |         round(CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |                    w -> w IN ('the','and','of','to','a'))) AS DOUBLE)
        |               / CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE),
        |               9) AS conf
        |  FROM documents
        |  WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0
        |), b AS (
        |  SELECT least(CAST(floor(conf * 10.0) AS BIGINT), 9) AS bin, conf, y FROM t
        |), g AS (
        |  SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
        |         sum(CAST(conf AS DECIMAL(28,12))) AS conf_sum
        |  FROM b GROUP BY bin
        |), r AS (
        |  SELECT bin, n, n_pos,
        |         round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 9) AS acc,
        |         round(CAST(conf_sum AS DOUBLE) / CAST(n AS DOUBLE), 9) AS avg_conf
        |  FROM g
        |), r2 AS (SELECT *, round(abs(acc - avg_conf), 9) AS gap FROM r)
        |SELECT bin, n, n_pos, acc, avg_conf, gap,
        |       round(CAST(sum(CAST(round(gap * n, 6) AS DECIMAL(28,12))) OVER ()
        |                  AS DOUBLE)
        |             / CAST(sum(n) OVER () AS DOUBLE), 9) AS ece
        |FROM r2 ORDER BY bin""".stripMargin,
    // NDCG replay: the q_rrf_fusion ranking chain + graded gains from
    // the exact cosine ranks; 9-dp discounts, decimal per-query sums
    "q_ndcg" ->
      s"""WITH $CosineCte,
         |dots AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS nn_id, ${DotSql("q", "c")} AS dot
         |  FROM v q JOIN v c ON c.vec_id <> q.vec_id, range(64) r(d)
         |  WHERE q.vec_id < 10
         |  GROUP BY q.vec_id, c.vec_id
         |), s2 AS (
         |  SELECT vec_id, CAST(sum(CAST(CAST(embedding[d+1] AS DOUBLE)
         |         * CAST(embedding[d+1] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS sq
         |  FROM v, range(64) r(d) GROUP BY vec_id
         |), crank AS (
         |  SELECT q_id, nn_id, row_number() OVER (PARTITION BY q_id
         |           ORDER BY sim DESC, nn_id) AS rank FROM (
         |    SELECT d.q_id, d.nn_id, d.dot / (nq.nrm * nc.nrm) AS sim
         |    FROM dots d JOIN nrm nq ON nq.vec_id = d.q_id
         |    JOIN nrm nc ON nc.vec_id = d.nn_id)
         |), lrank AS (
         |  SELECT q_id, nn_id, row_number() OVER (PARTITION BY q_id
         |           ORDER BY sim DESC, nn_id) AS rank FROM (
         |    SELECT d.q_id, d.nn_id, -(q.sq - 2.0 * d.dot + c.sq) AS sim
         |    FROM dots d JOIN s2 q ON q.vec_id = d.q_id
         |    JOIN s2 c ON c.vec_id = d.nn_id)
         |), u AS (
         |  SELECT * FROM crank WHERE rank <= 10
         |  UNION ALL SELECT * FROM lrank WHERE rank <= 10
         |), f AS (
         |  SELECT q_id, nn_id,
         |         sum(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + rank)) AS rrf
         |  FROM u GROUP BY q_id, nn_id
         |), fr AS (
         |  SELECT q_id, nn_id, fused_rank AS pos FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id
         |             ORDER BY rrf DESC, nn_id) AS fused_rank FROM f) x
         |  WHERE fused_rank <= 10
         |), rel AS (
         |  SELECT q_id, nn_id,
         |         CASE WHEN rank <= 2 THEN 3 WHEN rank <= 5 THEN 2 ELSE 1 END AS rel
         |  FROM crank WHERE rank <= 10
         |), sys AS (
         |  SELECT fr.q_id, fr.pos, coalesce(rel.rel, 0) AS rel
         |  FROM fr LEFT JOIN rel ON rel.q_id = fr.q_id AND rel.nn_id = fr.nn_id
         |), dcg AS (
         |  SELECT q_id,
         |         sum(CAST(round(CAST((1 << rel) - 1 AS DOUBLE)
         |             * round(1.0 / log2(CAST(pos + 1 AS DOUBLE)), 9), 9)
         |             AS DECIMAL(28,12))) AS dcg_sum,
         |         CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_rel_ranked
         |  FROM sys GROUP BY q_id
         |), ideal AS (
         |  SELECT q_id,
         |         sum(CAST(round(CAST((1 << rel) - 1 AS DOUBLE)
         |             * round(1.0 / log2(CAST(ipos + 1 AS DOUBLE)), 9), 9)
         |             AS DECIMAL(28,12))) AS idcg_sum,
         |         count(*) AS n_rel
         |  FROM (
         |    SELECT q_id, rel, row_number() OVER (PARTITION BY q_id
         |             ORDER BY rel DESC, nn_id) AS ipos
         |    FROM rel WHERE rel > 0) i
         |  WHERE ipos <= 10 GROUP BY q_id
         |)
         |SELECT d.q_id, round(CAST(dcg_sum AS DOUBLE), 6) AS dcg,
         |       round(CAST(idcg_sum AS DOUBLE), 6) AS idcg,
         |       CASE WHEN idcg_sum IS NOT NULL THEN
         |         round(CAST(dcg_sum AS DOUBLE) / CAST(idcg_sum AS DOUBLE), 6)
         |       END AS ndcg,
         |       coalesce(n_rel, 0) AS n_rel, n_rel_ranked
         |FROM dcg d LEFT JOIN ideal USING (q_id) ORDER BY d.q_id""".stripMargin,
    // PSI replay: Laplace add-one bin probabilities (integer-exact
    // before one IEEE division), 9-dp ln terms, decimal total
    "q_psi" ->
      """WITH refc AS (
        |  SELECT least(n_chars // 100, 9) AS bin, count(*) AS cnt_ref
        |  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
        |), curc AS (
        |  SELECT least(n_chars // 100, 9) AS bin, count(*) AS cnt_cur
        |  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1
        |), m AS (
        |  SELECT coalesce(refc.bin, curc.bin) AS bin,
        |         coalesce(cnt_ref, 0) AS cnt_ref,
        |         coalesce(cnt_cur, 0) AS cnt_cur
        |  FROM refc FULL OUTER JOIN curc ON refc.bin = curc.bin
        |), p AS (
        |  SELECT bin, cnt_ref, cnt_cur,
        |         round(CAST(cnt_ref + 1 AS DOUBLE)
        |               / CAST(sum(cnt_ref) OVER () + 10 AS DOUBLE), 9) AS p_ref,
        |         round(CAST(cnt_cur + 1 AS DOUBLE)
        |               / CAST(sum(cnt_cur) OVER () + 10 AS DOUBLE), 9) AS p_cur
        |  FROM m
        |), t AS (
        |  SELECT *, round((p_ref - p_cur) * ln(p_ref / p_cur), 9) AS term FROM p
        |)
        |SELECT bin, cnt_ref, cnt_cur, p_ref, p_cur, term,
        |       round(CAST(sum(CAST(term AS DECIMAL(28,12))) OVER () AS DOUBLE), 9)
        |         AS psi
        |FROM t ORDER BY bin""".stripMargin,
    // kNN neighbor-vote replay over the exact directed top-5 lists
    "q_label_noise" ->
      s"""WITH $CosineCte,
         |dots AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb, ${DotSql("a", "b")} AS dot
         |  FROM v a JOIN v b ON a.vec_id < b.vec_id, range(64) r(d)
         |  GROUP BY a.vec_id, b.vec_id
         |), sims AS (
         |  SELECT d.va, d.vb, d.dot / (na.nrm * nb.nrm) AS sim
         |  FROM dots d JOIN nrm na ON na.vec_id = d.va
         |  JOIN nrm nb ON nb.vec_id = d.vb
         |), bi AS (
         |  SELECT va AS q, vb AS n, sim FROM sims
         |  UNION ALL SELECT vb, va, sim FROM sims
         |), rk AS (
         |  SELECT q, n, row_number() OVER (PARTITION BY q
         |                                  ORDER BY sim DESC, n) AS rank
         |  FROM bi
         |), knn AS (SELECT q, n FROM rk WHERE rank <= 5),
         |agg AS (
         |  SELECT lq.vec_id AS vec_id, lq.label AS label,
         |         count(*) AS n_neighbors,
         |         CAST(sum(CASE WHEN ln.label = lq.label THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_agree
         |  FROM knn JOIN embeddings lq ON lq.vec_id = knn.q
         |  JOIN embeddings ln ON ln.vec_id = knn.n
         |  GROUP BY lq.vec_id, lq.label
         |)
         |SELECT vec_id, label, n_neighbors, n_agree,
         |       round(CAST(n_agree AS DOUBLE) / CAST(n_neighbors AS DOUBLE), 9)
         |         AS agree_frac,
         |       2 * n_agree < n_neighbors AS suspect
         |FROM agg ORDER BY vec_id""".stripMargin,
    // hashing-trick replay: the md5 open hash drives bucket AND sign
    "q_feature_hash" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents WHERE doc_id < 50
        |), hh AS (
        |  SELECT doc_id, ('0x' || substring(md5(w || '|fh'), 1, 6))::BIGINT AS h
        |  FROM tok
        |), sb AS (
        |  SELECT doc_id, h % 64 AS bucket,
        |         CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END AS s
        |  FROM hh
        |), vv AS (
        |  SELECT doc_id, bucket, CAST(sum(s) AS BIGINT) AS v
        |  FROM sb GROUP BY doc_id, bucket
        |)
        |SELECT doc_id, bucket, v,
        |       CAST(sum(CASE WHEN v <> 0 THEN 1 ELSE 0 END)
        |            OVER (PARTITION BY doc_id) AS BIGINT) AS nnz,
        |       CAST(sum(v * v) OVER (PARTITION BY doc_id) AS BIGINT) AS norm2
        |FROM vv ORDER BY doc_id, bucket""".stripMargin,
    // grouped exact Gini replay: all-BIGINT Lorenz accumulation
    "q_token_gini" ->
      """WITH t AS (
        |  SELECT len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS v
        |  FROM documents
        |), g AS (
        |  SELECT v, count(*) AS n_rows FROM t GROUP BY v
        |), g2 AS (SELECT v, n_rows, v * n_rows AS mass FROM g),
        |c AS (
        |  SELECT v, n_rows, mass,
        |         CAST(sum(n_rows) OVER (ORDER BY v) AS BIGINT) AS cum_rows,
        |         CAST(sum(mass) OVER (ORDER BY v) AS BIGINT) AS cum_mass
        |  FROM g2
        |), tot AS (
        |  SELECT CAST(sum(n_rows) AS BIGINT) AS n_tot,
        |         CAST(sum(mass) AS BIGINT) AS t_tot,
        |         CAST(sum(n_rows * (2 * (cum_mass - mass) + mass)) AS BIGINT) AS g_num
        |  FROM c
        |)
        |SELECT v, n_rows, mass, cum_rows, cum_mass,
        |       round(CAST(cum_rows AS DOUBLE) / CAST(n_tot AS DOUBLE), 9) AS lorenz_p,
        |       round(CAST(cum_mass AS DOUBLE) / CAST(t_tot AS DOUBLE), 9) AS lorenz_l,
        |       round(1.0 - CAST(g_num AS DOUBLE) / CAST(n_tot * t_tot AS DOUBLE), 9)
        |         AS gini
        |FROM c, tot ORDER BY v""".stripMargin,
    // streaming drift replay: epoch-aligned daily windows (Spark
    // window(ts,'1 day') ≡ date_trunc under UTC), Laplace bin probs
    "q_stream_psi" ->
      """WITH ev AS (
        |  SELECT ts, least(CAST(floor(value / 50.0) AS BIGINT), 9) AS bin
        |  FROM events
        |), ref AS (
        |  SELECT bin, count(*) AS cnt_ref FROM ev GROUP BY bin
        |), rt AS (SELECT CAST(sum(cnt_ref) AS BIGINT) AS n_ref FROM ref),
        |wb AS (
        |  SELECT epoch_us(date_trunc('day', ts)) AS start_us, bin,
        |         count(*) AS cnt
        |  FROM ev GROUP BY 1, 2
        |), grps AS (SELECT DISTINCT start_us FROM wb),
        |axis AS (
        |  SELECT g.start_us, r.bin, r.cnt_ref FROM grps g CROSS JOIN ref r
        |), m AS (
        |  SELECT a.start_us, a.bin, a.cnt_ref, coalesce(wb.cnt, 0) AS cnt
        |  FROM axis a LEFT JOIN wb
        |    ON wb.start_us = a.start_us AND wb.bin = a.bin
        |), p AS (
        |  SELECT start_us, bin, cnt, cnt_ref,
        |         round(CAST(cnt + 1 AS DOUBLE)
        |               / CAST(sum(cnt) OVER (PARTITION BY start_us) + 10
        |                      AS DOUBLE), 9) AS p_cur,
        |         round(CAST(cnt_ref + 1 AS DOUBLE)
        |               / CAST(rt.n_ref + 10 AS DOUBLE), 9) AS p_ref
        |  FROM m, rt
        |), t AS (
        |  SELECT *, round((p_ref - p_cur) * ln(p_ref / p_cur), 9) AS term FROM p
        |)
        |SELECT start_us, bin, cnt, cnt_ref, p_cur, p_ref, term,
        |       round(CAST(sum(CAST(term AS DECIMAL(28,12)))
        |                  OVER (PARTITION BY start_us) AS DOUBLE), 9) AS psi
        |FROM t ORDER BY start_us, bin""".stripMargin,
    // hard-negative replay: label-mismatch filter before the rank
    "q_hard_negatives" ->
      s"""WITH $CosineCte,
         |dots AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS nn_id, ${DotSql("q", "c")} AS dot
         |  FROM v q JOIN v c ON c.vec_id <> q.vec_id, range(64) r(d)
         |  WHERE q.vec_id < 10
         |  GROUP BY q.vec_id, c.vec_id
         |), sims AS (
         |  SELECT d.q_id, lq.label AS label_q, d.nn_id, lc.label AS label_n,
         |         d.dot / (nq.nrm * nc.nrm) AS sim
         |  FROM dots d
         |  JOIN nrm nq ON nq.vec_id = d.q_id
         |  JOIN nrm nc ON nc.vec_id = d.nn_id
         |  JOIN embeddings lq ON lq.vec_id = d.q_id
         |  JOIN embeddings lc ON lc.vec_id = d.nn_id
         |  WHERE lq.label <> lc.label
         |), rk AS (
         |  SELECT q_id, label_q, nn_id, label_n, sim,
         |         row_number() OVER (PARTITION BY q_id
         |                            ORDER BY sim DESC, nn_id) AS rank
         |  FROM sims
         |)
         |SELECT q_id, label_q, nn_id, label_n, round(sim, 6) AS sim, rank
         |FROM rk WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    // per-slice Mann–Whitney replay: PARTITION BY slice everywhere
    "q_sliced_auc" ->
      """WITH lab AS (
        |  SELECT source AS slice, n_chars // 16 AS score,
        |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents
        |), bys AS (
        |  SELECT slice, score, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos
        |  FROM lab GROUP BY slice, score
        |), rk AS (
        |  SELECT slice, score, n, n_pos,
        |         CAST(sum(n) OVER (PARTITION BY slice ORDER BY score)
        |              AS BIGINT) AS cum_le
        |  FROM bys
        |), agg AS (
        |  SELECT slice, CAST(sum(n) AS BIGINT) AS n_rows,
        |         CAST(sum(n_pos) AS BIGINT) AS p_tot,
        |         CAST(sum(n - n_pos) AS BIGINT) AS n_tot,
        |         CAST(sum(n_pos * (2 * (cum_le - n) + n + 1)) AS BIGINT) AS s2,
        |         count(*) AS n_scores
        |  FROM rk GROUP BY slice
        |)
        |SELECT slice, n_rows, p_tot, n_tot, n_scores,
        |       CASE WHEN p_tot > 0 AND n_tot > 0 THEN
        |         round(CAST(s2 - p_tot * (p_tot + 1) AS DOUBLE)
        |               / CAST(2 * p_tot * n_tot AS DOUBLE), 9)
        |       END AS auc
        |FROM agg ORDER BY slice""".stripMargin,
    // split-conformal replay: BIGINT rank on the milli-α grid, exact
    // element threshold, flag rate vs the finite-sample bound
    "q_conformal" ->
      """WITH cal AS (
        |  SELECT n_chars AS score FROM documents WHERE doc_id % 5 = 0
        |), bys AS (
        |  SELECT score, count(*) AS n FROM cal GROUP BY score
        |), cum AS (
        |  SELECT score, CAST(sum(n) OVER (ORDER BY score) AS BIGINT) AS cum_le
        |  FROM bys
        |), nc AS (SELECT count(*) AS n_calib FROM cal),
        |al(alpha, am) AS (VALUES (CAST(0.1 AS DOUBLE), 100),
        |                         (CAST(0.05 AS DOUBLE), 50),
        |                         (CAST(0.01 AS DOUBLE), 10)),
        |rr AS (
        |  SELECT alpha, n_calib,
        |         ((1000 - am) * (n_calib + 1) + 999) // 1000 AS r
        |  FROM al, nc
        |), thr AS (
        |  SELECT alpha, n_calib, r,
        |         coalesce(min(CASE WHEN cum_le >= r THEN score END),
        |                  max(score)) AS threshold
        |  FROM rr, cum GROUP BY alpha, n_calib, r
        |), ev AS (
        |  SELECT n_chars AS score FROM documents WHERE doc_id % 5 <> 0
        |), f AS (
        |  SELECT alpha, n_calib, r, threshold, count(*) AS n_eval,
        |         CAST(sum(CASE WHEN ev.score > threshold THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_flagged
        |  FROM thr, ev GROUP BY alpha, n_calib, r, threshold
        |), pub AS (
        |  SELECT alpha, n_calib, r, threshold, n_eval, n_flagged,
        |         round(CAST(n_flagged AS DOUBLE) / CAST(n_eval AS DOUBLE), 9)
        |           AS flag_rate,
        |         round(alpha + 1.0 / CAST(n_calib + 1 AS DOUBLE), 9) AS bound
        |  FROM f
        |)
        |SELECT *, flag_rate <= bound AS valid FROM pub ORDER BY alpha""".stripMargin,
    // KS replay: cross-multiplied BIGINT ECDF gaps, one final divide
    "q_ks_drift" ->
      """WITH ca AS (
        |  SELECT n_chars AS v, count(*) AS n_a FROM documents
        |  WHERE doc_id % 2 = 0 GROUP BY 1
        |), cb AS (
        |  SELECT n_chars AS v, count(*) AS n_b FROM documents
        |  WHERE doc_id % 2 = 1 GROUP BY 1
        |), m AS (
        |  SELECT coalesce(ca.v, cb.v) AS v,
        |         coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
        |  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v
        |), c AS (
        |  SELECT v, n_a, n_b,
        |         CAST(sum(n_a) OVER (ORDER BY v) AS BIGINT) AS cum_a,
        |         CAST(sum(n_b) OVER (ORDER BY v) AS BIGINT) AS cum_b,
        |         CAST(sum(n_a) OVER () AS BIGINT) AS na,
        |         CAST(sum(n_b) OVER () AS BIGINT) AS nb
        |  FROM m
        |), d AS (
        |  SELECT *, abs(cum_a * nb - cum_b * na) AS num FROM c
        |), pub AS (
        |  SELECT v, n_a, n_b, cum_a, cum_b,
        |         round(CAST(cum_a AS DOUBLE) / CAST(na AS DOUBLE), 9) AS ecdf_a,
        |         round(CAST(cum_b AS DOUBLE) / CAST(nb AS DOUBLE), 9) AS ecdf_b,
        |         round(CAST(num AS DOUBLE) / CAST(na * nb AS DOUBLE), 9) AS diff,
        |         round(CAST(max(num) OVER () AS DOUBLE)
        |               / CAST(na * nb AS DOUBLE), 9) AS d_stat,
        |         round(1.358 * sqrt(CAST(na + nb AS DOUBLE)
        |                            / CAST(na * nb AS DOUBLE)), 9) AS crit_05
        |  FROM d
        |)
        |SELECT *, d_stat > crit_05 AS reject_05 FROM pub ORDER BY v""".stripMargin,
    // equi-depth replay: BIGINT boundary ranks, buckets by strict
    // boundary count, realized depths
    "q_equidepth" ->
      """WITH t AS (SELECT n_chars AS v FROM documents),
        |byv AS (SELECT v, count(*) AS n FROM t GROUP BY v),
        |c AS (
        |  SELECT v, n, CAST(sum(n) OVER (ORDER BY v) AS BIGINT) AS cum FROM byv
        |), tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c),
        |rk AS (
        |  SELECT i, (i * n_total + 9) // 10 AS r
        |  FROM range(1, 10) t(i), tot
        |), bd AS (
        |  SELECT rk.i, min(CASE WHEN c.cum >= rk.r THEN c.v END) AS b
        |  FROM rk CROSS JOIN c GROUP BY rk.i
        |), bk AS (
        |  SELECT c.v, c.n,
        |         CAST(sum(CASE WHEN c.v > bd.b THEN 1 ELSE 0 END) AS BIGINT)
        |           AS bucket
        |  FROM c CROSS JOIN bd GROUP BY c.v, c.n
        |), agg AS (
        |  SELECT bucket, CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_values
        |  FROM bk GROUP BY bucket
        |)
        |SELECT a.bucket, lo.b AS lo, hi.b AS hi, a.n_rows, a.n_values,
        |       round(CAST(a.n_rows AS DOUBLE) / CAST(tot.n_total AS DOUBLE), 9)
        |         AS depth_frac
        |FROM agg a
        |LEFT JOIN bd hi ON hi.i = a.bucket + 1
        |LEFT JOIN bd lo ON lo.i = a.bucket
        |CROSS JOIN tot
        |ORDER BY a.bucket""".stripMargin,
    // skew replay: key-count table + totals, ties to the smaller key
    "q_skew_report" ->
      """WITH cnt AS (
        |  SELECT user_id AS key, count(*) AS n FROM events GROUP BY user_id
        |), tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n_total, count(*) AS n_keys FROM cnt
        |), top AS (
        |  SELECT key, n, row_number() OVER (ORDER BY n DESC, key) AS rank FROM cnt
        |)
        |SELECT rank, key, n,
        |       round(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE), 9) AS share,
        |       round(CAST(n * n_keys AS DOUBLE) / CAST(n_total AS DOUBLE), 9)
        |         AS skew_vs_mean,
        |       n_total, n_keys
        |FROM top, tot WHERE rank <= 10 ORDER BY rank""".stripMargin
  )

  /** DuckDB CTE chain for marker-based language ID: markers/toks/hits/
    * best(doc_id, lang, hits). Shared by q_lang_id and q_curation.
    */
  private val LangCtes: String =
    """markers(lang, word) AS (VALUES
      |  ('en','the'),('en','and'),('en','of'),('en','to'),('en','a'),
      |  ('fr','le'),('fr','la'),('fr','et'),('fr','les'),('fr','des'),
      |  ('es','el'),('es','la'),('es','de'),('es','los'),('es','y'),
      |  ('de','der'),('de','die'),('de','und'),('de','das'),('de','ein')
      |), ltoks AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
      |  FROM documents
      |), hits AS (
      |  SELECT doc_id, lang, count(*) AS hits
      |  FROM ltoks JOIN markers USING (word) GROUP BY doc_id, lang
      |), best AS (
      |  SELECT doc_id, lang, hits FROM (
      |    SELECT *, row_number() OVER (PARTITION BY doc_id
      |                                 ORDER BY hits DESC, lang) AS rn
      |    FROM hits) x WHERE rn = 1
      |)""".stripMargin

  /** Unrolled Bradley–Terry MM rounds for the q_bradley_terry oracle:
    * p{t} derives from p{t-1} via the same 9-dp-rounded / decimal-
    * summed update the engine runs. MATERIALIZED throughout — the
    * recurrence references each prior round twice (the pagerank
    * inlining lesson).
    */
  private def btRoundsSql(rounds: Int): String =
    (1 to rounds).map { t =>
      s"""d$t AS MATERIALIZED (
         |  SELECT s.i,
         |    CAST(sum(CAST(round(CAST(s.n AS DOUBLE) / (pi.p + pj.p), 9)
         |             AS DECIMAL(38,12))) AS DOUBLE) AS den
         |  FROM sym s JOIN p${t - 1} pi ON pi.i = s.i
         |  JOIN p${t - 1} pj ON pj.i = s.j
         |  GROUP BY s.i
         |), r$t AS MATERIALIZED (
         |  SELECT t.i, round(CAST(t.wins AS DOUBLE) / d.den, 9) AS praw
         |  FROM tot t JOIN d$t d ON d.i = t.i
         |), p$t AS MATERIALIZED (
         |  SELECT i, round(praw / (SELECT CAST(sum(CAST(praw AS DECIMAL(38,12)))
         |                               AS DOUBLE) FROM r$t), 9) AS p
         |  FROM r$t
         |)""".stripMargin
    }.mkString(",\n")

  /** Unrolled k-center greedy rounds for the q_kcenter oracle: each
    * round picks the farthest point (s{t}), looks up its quantized
    * vector (c{t}) and min-updates every point's distance² (m{t}) —
    * all in exact int64. MATERIALIZED: m{t} feeds both the next argmax
    * and the next update.
    */
  private def kcRoundsSql(rounds: Int): String =
    (1 to rounds).map { t =>
      s"""s$t AS MATERIALIZED (
         |  SELECT vec_id, d2 FROM m${t - 1} ORDER BY d2 DESC, vec_id LIMIT 1
         |), c$t AS MATERIALIZED (
         |  SELECT p.vec_id, p.q FROM pts p JOIN s$t s ON s.vec_id = p.vec_id
         |), m$t AS MATERIALIZED (
         |  SELECT p.vec_id,
         |    least(m.d2, CAST(sum((p.q[d+1] - c.q[d+1]) * (p.q[d+1] - c.q[d+1]))
         |                AS BIGINT)) AS d2
         |  FROM pts p JOIN m${t - 1} m ON m.vec_id = p.vec_id
         |  CROSS JOIN c$t c, range(64) r(d)
         |  GROUP BY p.vec_id, m.d2
         |)""".stripMargin
    }.mkString(",\n")

  /** Unrolled MMR selection rounds 2..`select` for the q_mmr oracle:
    * each round anti-joins the accumulated picks (a{t-1}), computes
    * the redundancy max over 6-dp pair sims and picks the score
    * argmax with the nn_id tie-break — the engine's loop replayed.
    */
  private def mmrRoundsSql(select: Int): String = {
    val score = "CAST(0.7 AS DOUBLE) * r.rel - (CAST(1 AS DOUBLE) " +
      "- CAST(0.7 AS DOUBLE)) * coalesce(m.mxs, CAST(0 AS DOUBLE))"
    (2 to select).map { t =>
      s"""rem$t AS (
         |  SELECT c.q_id, c.nn_id, c.rel FROM cand c
         |  WHERE NOT EXISTS (SELECT 1 FROM a${t - 1} s
         |                    WHERE s.q_id = c.q_id AND s.nn_id = c.nn_id)
         |), mx$t AS (
         |  SELECT r.q_id, r.nn_id, max(p.s) AS mxs
         |  FROM rem$t r JOIN ps p ON p.q_id = r.q_id AND p.a = r.nn_id
         |  JOIN a${t - 1} s ON s.q_id = p.q_id AND s.nn_id = p.b
         |  GROUP BY r.q_id, r.nn_id
         |), pick$t AS MATERIALIZED (
         |  SELECT q_id, nn_id, $t AS mmr_rank, score FROM (
         |    SELECT r.q_id, r.nn_id, $score AS score,
         |           row_number() OVER (PARTITION BY r.q_id
         |             ORDER BY $score DESC, r.nn_id) AS rk
         |    FROM rem$t r LEFT JOIN mx$t m
         |      ON m.q_id = r.q_id AND m.nn_id = r.nn_id) x
         |  WHERE rk = 1
         |), a$t AS MATERIALIZED (
         |  SELECT * FROM a${t - 1} UNION ALL SELECT * FROM pick$t
         |)""".stripMargin
    }.mkString(",\n")
  }

  /** Unrolled TextRank rounds for the q_textrank oracle: 9-dp
    * contribution terms decimal-summed per node, damped update
    * re-rounded 9dp — the engine's fixpoint path replayed. */
  private def trRoundsSql(rounds: Int): String =
    (1 to rounds).map { t =>
      s"""tc$t AS MATERIALIZED (
         |  SELECT e.dst AS word,
         |    CAST(sum(CAST(round(e.frac * r.r, 9) AS DECIMAL(38,12))) AS DOUBLE) AS s
         |  FROM tre e JOIN tr${t - 1} r ON r.word = e.src GROUP BY e.dst
         |), tr$t AS MATERIALIZED (
         |  SELECT n.word,
         |    round((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
         |            / CAST((SELECT nn FROM trcnt) AS DOUBLE)
         |          + CAST(0.85 AS DOUBLE) * coalesce(c.s, CAST(0 AS DOUBLE)), 9) AS r
         |  FROM trnodes n LEFT JOIN tc$t c USING (word)
         |)""".stripMargin
    }.mkString(",\n")

  /** DuckDB CTE for quality features: qf(doc_id, n_tokens, punct_ratio,
    * stop_ratio, score). Shared by q_quality and q_curation.
    */
  private val QualityCte: String =
    """qf AS (
      |  SELECT doc_id, n_tokens, punct_ratio, stop_ratio,
      |         least(n_tokens / 64.0, 1.0) * 0.5
      |           + (1.0 - punct_ratio) * 0.3
      |           + least(stop_ratio * 4.0, 1.0) * 0.2 AS score
      |  FROM (
      |    SELECT doc_id,
      |           len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
      |           CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
      |             / greatest(length(text), 1) AS punct_ratio,
      |           CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
      |                                t -> t IN ('the','a','of','to','and'))) AS DOUBLE)
      |             / greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 1) AS stop_ratio
      |    FROM documents) f
      |)""".stripMargin

  private val oracleSqlTextAnalysis: Map[String, String] = Map(
    // rule replay: same exact-int cross-multiplied flags, same
    // exact-int IEEE division ratios rounded 6dp
    "q_gopher_rules" ->
      """WITH w AS (
        |  SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        |  FROM documents
        |), f AS (
        |  SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS nw,
        |    CAST(list_aggregate(list_transform(ws, x -> length(x)), 'sum') AS BIGINT) AS sc,
        |    CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS na,
        |    CAST(len(list_filter(ws, x -> x IN ('the','a','of','to','and'))) AS BIGINT) AS nstop,
        |    CAST(length(text) AS BIGINT) AS nc,
        |    CAST(length(text) - length(regexp_replace(text, '[^a-z0-9\s]', '', 'g')) AS BIGINT) AS nsym
        |  FROM w WHERE len(ws) > 0
        |)
        |SELECT doc_id, nw AS n_words,
        |       round(CAST(sc AS DOUBLE) / nw, 6) AS mean_word_len,
        |       round(CAST(nsym AS DOUBLE) / nc, 6) AS symbol_frac,
        |       round(CAST(na AS DOUBLE) / nw, 6) AS alpha_frac,
        |       nstop AS n_stop,
        |       nw >= 30 AND nw <= 80 AS wc_ok,
        |       sc * 10 >= 40 * nw AND sc * 10 <= 50 * nw AS len_ok,
        |       nsym * 10 <= nc AS sym_ok,
        |       na * 5 >= nw * 4 AS alpha_ok,
        |       nstop >= 2 AS stop_ok,
        |       (nw >= 30 AND nw <= 80)
        |         AND (sc * 10 >= 40 * nw AND sc * 10 <= 50 * nw)
        |         AND nsym * 10 <= nc AND na * 5 >= nw * 4 AND nstop >= 2 AS keep
        |FROM f ORDER BY doc_id""".stripMargin,
    // kappa replay: confusion counts + marginal products are exact
    // int64; po/pe exact-int divisions; one IEEE dag for kappa
    "q_kappa" ->
      s"""WITH $LangCtes,
         |lab AS (
         |  SELECT d.doc_id, coalesce(b.lang, 'und') AS pa, d.lang AS pb
         |  FROM documents d LEFT JOIN best b USING (doc_id)
         |), cm AS (
         |  SELECT pa, pb, CAST(count(*) AS BIGINT) AS c FROM lab GROUP BY 1, 2
         |), tot AS (
         |  SELECT CAST(sum(c) AS BIGINT) AS n,
         |         CAST(sum(CASE WHEN pa = pb THEN c ELSE 0 END) AS BIGINT) AS diag
         |  FROM cm
         |), ra AS (SELECT pa AS label, CAST(sum(c) AS BIGINT) AS ca FROM cm GROUP BY 1),
         |rb AS (SELECT pb AS label, CAST(sum(c) AS BIGINT) AS cb FROM cm GROUP BY 1),
         |labs AS (SELECT label FROM ra UNION SELECT label FROM rb),
         |marg AS (
         |  SELECT l.label, coalesce(ra.ca, 0) AS ca, coalesce(rb.cb, 0) AS cb
         |  FROM labs l LEFT JOIN ra USING (label) LEFT JOIN rb USING (label)
         |), tp AS (SELECT pa AS label, c AS tp FROM cm WHERE pa = pb),
         |per AS (
         |  SELECT m.label, t.n,
         |    CAST(coalesce(p.tp, 0) + (t.n - m.ca - m.cb + coalesce(p.tp, 0)) AS DOUBLE)
         |      / t.n AS po,
         |    CAST(m.ca * m.cb + (t.n - m.ca) * (t.n - m.cb) AS DOUBLE)
         |      / (t.n * t.n) AS pe
         |  FROM marg m CROSS JOIN tot t LEFT JOIN tp p USING (label)
         |), allr AS (
         |  SELECT 'ALL' AS label, t.n,
         |    CAST(t.diag AS DOUBLE) / t.n AS po,
         |    CAST(CAST((SELECT sum(ca * cb) FROM marg) AS BIGINT) AS DOUBLE)
         |      / (t.n * t.n) AS pe
         |  FROM tot t
         |), u AS (SELECT * FROM per UNION ALL SELECT * FROM allr)
         |SELECT label, n, round(po, 6) AS po, round(pe, 6) AS pe,
         |       CASE WHEN pe < 1.0
         |            THEN round((po - pe) / (1.0 - pe), 6) + 0.0 END AS kappa
         |FROM u ORDER BY label""".stripMargin,
    "q_lang_id" ->
      s"""WITH $LangCtes
         |SELECT d.doc_id, coalesce(b.lang, 'und') AS lang_pred,
         |       coalesce(b.hits, 0) AS hits
         |FROM documents d LEFT JOIN best b USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q_quality" ->
      s"""WITH $QualityCte
         |SELECT doc_id, n_tokens, round(punct_ratio, 6) AS punct_ratio,
         |       round(stop_ratio, 6) AS stop_ratio, round(score, 6) AS score
         |FROM qf ORDER BY doc_id""".stripMargin,
    "q_token_counts" ->
      """SELECT doc_id,
        |       len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
        |       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens,
        |       round(CAST(length(text) AS DOUBLE)
        |             / greatest(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')), 1), 6)
        |         AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    // chunk starts step by 24 (= 32 − 8); a trailing start whose
    // remainder fits inside the previous window (n − s <= 8) is dropped
    // single global-window cumsum (fine at oracle scale; the ENGINE
    // must never plan one — that's the two-phase scan's whole point);
    // range(8192) bounds chunks at tested scales (~1600 at sf0.1)
    "q_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl
        |  FROM documents
        |  WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0
        |), offs AS (
        |  SELECT doc_id, dl,
        |         CAST(sum(dl) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS e
        |  FROM t
        |), spans AS (
        |  SELECT doc_id, e - dl AS s, e FROM offs
        |), ch AS (
        |  SELECT doc_id, s, e,
        |         unnest(generate_series(s // 256, (e - 1) // 256)) AS c
        |  FROM spans
        |)
        |SELECT c AS chunk_id, doc_id,
        |       greatest(s, c * 256) - c * 256 AS start_in_chunk,
        |       least(e, (c + 1) * 256) - greatest(s, c * 256) AS n_toks
        |FROM ch ORDER BY chunk_id, doc_id""".stripMargin,
    "q_chunk" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
        |), ok AS (
        |  SELECT doc_id, ws, len(ws) AS n FROM toks WHERE len(ws) > 0
        |), st AS (
        |  SELECT doc_id, ws, n, s, CAST(s / 24 AS BIGINT) AS chunk_no
        |  FROM ok JOIN range(2000) t(s) ON s % 24 = 0 AND s <= n - 1
        |  WHERE s = 0 OR n - s > 8
        |)
        |SELECT doc_id, CAST(chunk_no AS INTEGER) AS chunk_no,
        |       least(32, n - s) AS n_chunk_tokens,
        |       array_to_string(ws[s+1:s+32], ' ') AS chunk_text
        |FROM st ORDER BY doc_id, chunk_no""".stripMargin,
    "q_pii_redact" ->
      """WITH pii(doc_id, text) AS (VALUES
        |  (1, 'contact me at alice@example.com or 555-123-4567'),
        |  (2, 'server at 192.168.0.1 responded to 10.0.0.255 fine'),
        |  (3, 'no identifiers in this row at all'),
        |  (4, 'bob@test.org cc carol.smith@mail.example.co same ip 8.8.8.8'),
        |  (5, 'call 555-000-1111 then 555-000-2222 about alice@example.com'))
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS clean_text,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones,
        |  len(regexp_extract_all(text, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS n_ips
        |FROM pii ORDER BY doc_id""".stripMargin,
    "q_fingerprint" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |         ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS s
        |  FROM toks JOIN range(2000) t(i) ON i + 4 <= len(ws)
        |)
        |SELECT doc_id, min(('0x' || substring(md5(s), 1, 15))::BIGINT) AS fingerprint,
        |       count(*) AS n_shingles
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )

  /** Planted-PII corpus for q_pii_redact (inline on both sides). */
  private val PiiRows: Seq[(Long, String)] = Seq(
    (1L, "contact me at alice@example.com or 555-123-4567"),
    (2L, "server at 192.168.0.1 responded to 10.0.0.255 fine"),
    (3L, "no identifiers in this row at all"),
    (4L, "bob@test.org cc carol.smith@mail.example.co same ip 8.8.8.8"),
    (5L, "call 555-000-1111 then 555-000-2222 about alice@example.com"))

  /** Shared oracle for the source round-trip queries: the parquet
    * truth the CSV/JSON copies must reproduce exactly.
    */
  private val DocsMetaOracle: String =
    "SELECT doc_id, lang, source, n_chars FROM documents ORDER BY doc_id"

  /** Shared oracle for q_welford (batch UDAF) and q_stream_welford_state
    * (the flatMapGroupsWithState custom-state mirror): both must land on
    * the same per-type count/mean/population-std.
    */
  /** Rolling-anomaly oracle — shared verbatim by the batch
    * (q_ts_anomaly) and streaming (q_stream_anomaly) gates, so the two
    * engines' parity is checked against one ANSI definition.
    */
  /** Shared oracle for q_als_round (standalone) and q_als_item
    * (wrapped): int64-exact user normal equations + Cramer solve.
    */
  private val AlsUserOracle: String =
    s"""WITH ${Ratings.OracleDedupCte},
       |f AS (
       |  SELECT user_id, rating,
       |         10 + item_id % 7 AS i1, 5 + item_id % 11 AS i2
       |  FROM ratings
       |), s AS (
       |  SELECT user_id, count(*) AS n_items,
       |         CAST(sum(i1 * i1) AS BIGINT) AS s11,
       |         CAST(sum(i1 * i2) AS BIGINT) AS s12,
       |         CAST(sum(i2 * i2) AS BIGINT) AS s22,
       |         CAST(sum(rating * i1) AS BIGINT) AS t1,
       |         CAST(sum(rating * i2) AS BIGINT) AS t2
       |  FROM f GROUP BY user_id
       |), m AS (
       |  SELECT user_id, n_items,
       |         CAST(s11 AS DOUBLE) / 100.0 + 0.1 AS a11,
       |         CAST(s12 AS DOUBLE) / 100.0 AS a12,
       |         CAST(s22 AS DOUBLE) / 100.0 + 0.1 AS a22,
       |         CAST(t1 AS DOUBLE) / 10.0 AS b1,
       |         CAST(t2 AS DOUBLE) / 10.0 AS b2
       |  FROM s
       |)
       |SELECT user_id, n_items,
       |       round((a22 * b1 - a12 * b2) / (a11 * a22 - a12 * a12), 6) + 0.0 AS x1,
       |       round((a11 * b2 - a12 * b1) / (a11 * a22 - a12 * a12), 6) + 0.0 AS x2
       |FROM m ORDER BY user_id""".stripMargin

  /** Shared oracle for q_attribution / q_stream_attribution: IGNORE
    * NULLS running last-touch under the (ts, event_id) total order.
    */
  private val AttributionOracle: String =
    """WITH t AS (
      |  SELECT user_id, ts, event_type, event_id,
      |         last_value(CASE WHEN event_type IN ('click', 'view', 'signup')
      |                         THEN struct_pack(t_us := epoch_us(ts),
      |                                          t_type := event_type,
      |                                          t_id := event_id)
      |                    END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      |  FROM events
      |), c AS (
      |  SELECT user_id, event_id AS conv_event_id, epoch_us(ts) AS conv_ts_us,
      |         touch,
      |         touch IS NOT NULL
      |           AND epoch_us(ts) - touch.t_us <= 86400000000 AS in_w
      |  FROM t WHERE event_type = 'purchase'
      |)
      |SELECT user_id, conv_event_id, conv_ts_us,
      |       CASE WHEN in_w THEN touch.t_type END AS touch_type,
      |       CASE WHEN in_w THEN touch.t_id END AS touch_event_id,
      |       CASE WHEN in_w THEN (conv_ts_us - touch.t_us) // 60000000 END
      |         AS mins_since_touch
      |FROM c ORDER BY user_id, conv_event_id""".stripMargin

  private val TsAnomalyOracle: String =
    """WITH b AS (
      |  SELECT user_id, event_id, value,
      |         row_number() OVER wo AS seq,
      |         count(*) OVER wf AS n_prior,
      |         round(CAST(sum(CAST(value AS DECIMAL(28,12))) OVER wf AS DOUBLE)
      |               / count(*) OVER wf, 6) AS base_mean,
      |         round(stddev_pop(value) OVER wf, 6) AS base_std
      |  FROM events WHERE user_id < 30
      |  WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id),
      |         wf AS (PARTITION BY user_id ORDER BY ts, event_id
      |                ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
      |), c AS (
      |  SELECT user_id, event_id, seq, value, n_prior, base_mean, base_std,
      |         CASE WHEN n_prior >= 4 AND base_std > 0
      |              THEN round((value - base_mean) / base_std, 4) END AS z
      |  FROM b
      |)
      |SELECT user_id, event_id, seq, value, n_prior, base_mean, base_std, z,
      |       coalesce(abs(z) > 3.0, FALSE) AS is_anomaly
      |FROM c ORDER BY user_id, seq""".stripMargin

  private val WelfordOracle: String =
    """SELECT event_type, count(value) AS n, round(avg(value), 4) AS mean_value,
      |       round(stddev_pop(value), 4) AS std_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Shared signature CTE chain for the simhash oracle family:
    * bit-exact md5-derived SimHash reconstruction in pure SQL,
    * ending in `sigs(doc_id, sig)`.
    */
  private val SimhashSigsCte: String =
    """toks AS (
      |  SELECT doc_id, t AS token, count(*) AS cnt FROM (
      |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      |    FROM documents) x
      |  GROUP BY doc_id, t
      |), hashed AS (
      |  SELECT doc_id, cnt, ('0x' || substring(md5(token), 1, 15))::BIGINT AS h
      |  FROM toks
      |), bitw AS (
      |  SELECT doc_id, i,
      |         sum(CASE WHEN (h >> CAST(i AS INTEGER)) & 1 = 1 THEN cnt ELSE -cnt END) AS w
      |  FROM hashed, range(60) r(i) GROUP BY doc_id, i
      |), sigs AS (
      |  SELECT doc_id,
      |         CAST(sum(CASE WHEN w > 0 THEN (1::BIGINT << CAST(i AS INTEGER)) ELSE 0 END) AS BIGINT) AS sig
      |  FROM bitw GROUP BY doc_id
      |)""".stripMargin

  /** Shared oracle for q_naive_bayes (standalone) and q_confusion
    * (wrapped as a CTE): the full NB replay — same counts, 9-dp ln
    * terms, decimal sums, row_number argmax.
    */
  private val NaiveBayesOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, lang AS label,
      |         regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
      |  FROM documents
      |), trtok AS (
      |  SELECT label, unnest(ws) AS w FROM toks WHERE doc_id % 5 <> 0
      |), cwc AS (
      |  SELECT label, w, count(*) AS cwc FROM trtok GROUP BY label, w
      |), cls AS (
      |  SELECT label, count(*) AS nc FROM trtok GROUP BY label
      |), nd AS (
      |  SELECT label, count(*) AS ndc FROM toks WHERE doc_id % 5 <> 0 GROUP BY label
      |), ntot AS (
      |  SELECT count(*) AS n FROM toks WHERE doc_id % 5 <> 0
      |), voc AS (
      |  SELECT count(DISTINCT w) AS v FROM trtok
      |), classes AS (
      |  SELECT cls.label AS c, cls.nc,
      |         round(ln(CAST(nd.ndc AS DOUBLE) / CAST(ntot.n AS DOUBLE)), 9) AS prior
      |  FROM cls JOIN nd USING (label), ntot
      |), evtok AS (
      |  SELECT doc_id, label AS true_label, unnest(ws) AS w
      |  FROM toks WHERE doc_id % 5 = 0
      |), terms AS (
      |  SELECT e.doc_id, e.true_label, k.c, k.prior,
      |         round(ln(CAST(coalesce(cwc.cwc, 0) + 1 AS DOUBLE)
      |                  / CAST(k.nc + voc.v AS DOUBLE)), 9) AS t
      |  FROM evtok e CROSS JOIN classes k CROSS JOIN voc
      |  LEFT JOIN cwc ON cwc.label = k.c AND cwc.w = e.w
      |), scores AS (
      |  SELECT doc_id, true_label, c,
      |         sum(CAST(t AS DECIMAL(28,12))) + CAST(any_value(prior) AS DECIMAL(28,12)) AS score
      |  FROM terms GROUP BY doc_id, true_label, c
      |)
      |SELECT doc_id, true_label, c AS pred_label, c = true_label AS correct,
      |       round(CAST(score AS DOUBLE), 6) AS logp
      |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
      |                                   ORDER BY score DESC, c) AS rn
      |      FROM scores) x
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** Shared oracle for q_simhash / q_sql_simhash. */
  private val SimhashOracle: String =
    s"WITH $SimhashSigsCte\nSELECT doc_id, sig FROM sigs ORDER BY doc_id"

  /** Oracle for q_simhash_pairs: the QUADRATIC all-pairs Hamming scan
    * the pigeonhole block join replaces — equality is a recall proof
    * (pigeonhole completeness is structural, so any missing pair
    * would hash-mismatch).
    */
  private val SimhashPairsOracle: String =
    s"""WITH $SimhashSigsCte
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       bit_count(xor(a.sig, b.sig)) AS hamming
       |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= 3
       |ORDER BY id_a, id_b""".stripMargin

  /** Shared oracle for q_sessionize / q_stream_sessionize: the
    * gaps-and-islands mirror of `session_window` (split strictly
    * beyond the 30-minute gap — see NOTES.md on exact-gap merging).
    */
  private val SessionizeOracle: String =
    """WITH m AS (
      |  SELECT user_id, ts,
      |         CASE WHEN lag(ts) OVER w IS NULL THEN 1
      |              WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1
      |              ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), s AS (
      |  SELECT user_id, ts,
      |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |                        ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM m
      |)
      |SELECT user_id, epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
      |       count(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, start_us""".stripMargin

  /** Shared oracle for q_range_join / q_range_join_rule: DuckDB's own
    * (naive) inequality join over the same 20 maintenance windows.
    */
  private val RangeJoinOracle: String =
    s"""WITH w AS (
       |  SELECT i AS w_id,
       |         TIMESTAMP '2024-01-01 00:00:00' + to_hours(36 * i) AS w_start,
       |         TIMESTAMP '2024-01-01 00:00:00' + to_hours(36 * i + 48) AS w_end
       |  FROM range(20) t(i)
       |)
       |SELECT w.w_id, count(*) AS n, ${decMeanSql("e.value")} AS mean_value
       |FROM events e JOIN w ON e.ts >= w.w_start AND e.ts <= w.w_end
       |GROUP BY w.w_id ORDER BY w.w_id""".stripMargin

  /** DuckDB CTE mirroring [[MultimodalOps.asMedia]]'s metadata. */
  private val MediaCte: String =
    """media AS (
      |  SELECT doc_id AS media_id,
      |         (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
      |         CAST(16 + n_chars % 241 AS INTEGER) AS width,
      |         CAST(16 + (n_chars * 7) % 241 AS INTEGER) AS height,
      |         CAST(1 + (doc_id * 13) % 120 AS INTEGER) AS n_frames
      |  FROM documents
      |)""".stripMargin

  /** Exact decimal dot product between two aliased `v` rows (DuckDB). */
  private def DotSql(a: String, b: String): String =
    s"""CAST(sum(CAST(CAST($a.embedding[d+1] AS DOUBLE) * CAST($b.embedding[d+1] AS DOUBLE)
       |          AS DECIMAL(38,18))) AS DOUBLE)""".stripMargin

  /** Shared DuckDB CTEs for cosine queries: v (vectors) + nrm (norms). */
  private val CosineCte: String =
    s"""v AS (SELECT vec_id, embedding FROM embeddings),
       |nrm AS (
       |  SELECT vec_id, sqrt(CAST(sum(CAST(CAST(embedding[d+1] AS DOUBLE)
       |         * CAST(embedding[d+1] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
       |  FROM v, range(64) r(d) GROUP BY vec_id
       |)""".stripMargin

  /** DuckDB inverted-index shingle CTEs (3-gram, distinct per doc):
    * sh(doc_id, s), sz(doc_id, n), co(da, db, inter). `range(2000)`
    * caps docs at ~2000 words (corpus max is ~100).
    */
  private def ShingleCte(src: String): String =
    s"""toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM $src
       |), sh AS (
       |  SELECT DISTINCT doc_id, ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s
       |  FROM toks JOIN range(2000) t(i) ON i + 3 <= len(ws)
       |), sz AS (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
       |), co AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |)""".stripMargin

  /** DuckDB CTE chain mirroring CFOps (support filters → centering →
    * cosine similarities → 50-neighbor cap) for targets (3, 7).
    */
  private val CfCte: String =
    """items_ok AS (
      |  SELECT item_id FROM ratings GROUP BY item_id
      |  HAVING count(DISTINCT user_id) >= 25
      |), r1 AS (
      |  SELECT r.* FROM ratings r JOIN items_ok USING (item_id)
      |), users_ok AS (
      |  SELECT user_id FROM r1 GROUP BY user_id
      |  HAVING count(DISTINCT item_id) >= 5
      |), r2 AS (
      |  SELECT r1.* FROM r1 JOIN users_ok USING (user_id)
      |), centered AS (
      |  SELECT user_id, item_id, rating,
      |         rating - avg(rating) OVER (PARTITION BY item_id) AS rc
      |  FROM r2
      |), norms AS (
      |  SELECT item_id,
      |         sqrt(CAST(sum(CAST(rc * rc AS DECIMAL(30,15))) AS DOUBLE)) AS nrm
      |  FROM centered GROUP BY item_id
      |), tvec AS (
      |  SELECT * FROM centered WHERE item_id IN (3, 7)
      |), dots AS (
      |  SELECT c.item_id, t.item_id AS t_item,
      |         CAST(sum(CAST(c.rc * t.rc AS DECIMAL(30,15))) AS DOUBLE) AS dot,
      |         count(*) AS n_common
      |  FROM centered c JOIN tvec t
      |    ON c.user_id = t.user_id AND c.item_id <> t.item_id
      |  GROUP BY c.item_id, t.item_id
      |), sims AS (
      |  SELECT d.t_item, d.item_id, d.dot / (ni.nrm * nt.nrm) AS sim, d.n_common
      |  FROM dots d
      |  JOIN norms ni ON ni.item_id = d.item_id
      |  JOIN norms nt ON nt.item_id = d.t_item
      |  WHERE d.n_common >= 2 AND ni.nrm > 0 AND nt.nrm > 0
      |    AND d.dot / (ni.nrm * nt.nrm) > 0
      |), nbrs AS (
      |  SELECT t_item, item_id, sim, n_common FROM (
      |    SELECT *, row_number() OVER (PARTITION BY t_item
      |                                 ORDER BY sim DESC, item_id) AS rn
      |    FROM sims) x
      |  WHERE rn <= 50
      |)""".stripMargin

  /** DuckDB CTE mirroring [[regObs]] (dense top-k word observations). */
  private val RegObsCte: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '((?:[\.,!?;"])|(?:(?:\#|\@)?[A-Za-z0-9_\-]+(?:''[a-z]{1,3})?))', 1)) AS word
      |  FROM documents
      |), doclen AS (
      |  SELECT doc_id, count(*) AS total FROM toks GROUP BY doc_id
      |), tf AS (
      |  SELECT doc_id, word, count(*) AS cnt FROM toks GROUP BY doc_id, word
      |), top AS (
      |  SELECT word FROM toks GROUP BY word ORDER BY count(*) DESC, word LIMIT 20
      |), d AS (
      |  SELECT doc_id, CAST(1 + n_chars % 5 AS DOUBLE) AS y,
      |         CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS DOUBLE) AS c
      |  FROM documents
      |), dense AS (
      |  SELECT t.word, d.doc_id,
      |         CAST(coalesce(tf.cnt, 0) AS DOUBLE) / dl.total AS x, d.y, d.c
      |  FROM d JOIN doclen dl ON dl.doc_id = d.doc_id
      |  CROSS JOIN top t
      |  LEFT JOIN tf ON tf.doc_id = d.doc_id AND tf.word = t.word
      |)""".stripMargin
}
