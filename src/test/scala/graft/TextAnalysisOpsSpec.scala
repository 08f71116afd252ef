package graft

import graft.operators.{DedupOps, TextAnalysisOps}

class TextAnalysisOpsSpec extends SparkSpec {
  import spark.implicits._

  test("langId picks the max-marker language with deterministic ties") {
    val docs = Seq(
      (1L, "the cat and the dog of the house"),   // en x5
      (2L, "le chat et la maison des gens"),      // fr x4
      (3L, "xyzzy qwerty plugh"),                 // no markers -> und
      (4L, "la la")).toDF("doc_id", "text")       // es/fr tie on 'la' -> es (alphabetical)
    val got = TextAnalysisOps.langId(docs)
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ("en", 5L))
    assert(got(2L) == ("fr", 4L))
    assert(got(3L) == ("und", 0L))
    assert(got(4L) == ("es", 2L))
  }

  test("qualityScore is bounded and penalizes punctuation soup") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs to a tree"),
      (2L, "!!! ??? *** %%% $$$ @@@")).toDF("doc_id", "text")
    val got = TextAnalysisOps.qualityScore(docs)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(got.values.forall(s => s >= 0.0 && s <= 1.0))
    assert(got(1L) > got(2L))
  }

  test("tokenCounts: BPE-ish regex splits runs and symbols") {
    val docs = Seq((1L, "hello world42 x-1!")).toDF("doc_id", "text")
    // runs: hello, world, 42, x, -, 1, ! -> 7; ws tokens: 3
    val got = TextAnalysisOps.tokenCounts(docs)
      .as[(Long, Long, Long, Double)].head()
    assert(got._2 == 3L && got._3 == 7L)
  }

  test("fingerprints: exact duplicates share, distinct texts differ") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val fp = TextAnalysisOps.fingerprints(docs)
      .select("doc_id", "fingerprint").as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("near-dup docs in the corpus tend to share fingerprints") {
    val docs = Tables.documents(spark, sf0)
    val fp = TextAnalysisOps.fingerprints(docs)
      .select("doc_id", "fingerprint").as[(Long, Long)].collect().toMap
    val pairs = DedupOps.verifiedNearDups(docs, minJac = 0.8)
      .select("da", "db").as[(Long, Long)].collect()
    val share = pairs.count { case (a, b) => fp(a) == fp(b) }
    assert(pairs.nonEmpty && share * 2 >= pairs.length,
      s"only $share/${pairs.length} near-dup pairs share fingerprints")
  }

  test("repetitionStats flags looping docs, keeps diverse ones, drops tiny ones") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"), // one token dominates
      (2L, "the quick brown fox jumps over a lazy dog tonight"),  // all distinct
      (3L, "go stop go stop go stop go stop go stop"),            // 2-gram loop
      (4L, "one"))                                                // < 2 tokens: dropped
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysisOps.repetitionStats(docs)
      .select("doc_id", "top_token_frac", "dup_2gram_frac", "keep")
      .as[(Long, Double, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(!got.contains(4L))
    assert(got(1L)._2 == 1.0 && !got(1L)._4)      // all one token
    assert(got(2L)._2 == 0.1 && got(2L)._3 == 0.0) // 1/10 top, no dup 2-grams
    assert(got(2L)._4)
    // "go stop"×5: 10 tokens, 9 2-grams but only 2 distinct → dup 7/9
    assert(math.abs(got(3L)._3 - 7.0 / 9) < 1e-6 && !got(3L)._4)
  }

  test("packSequences: lossless layout, full chunks, bucket count irrelevant") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0)
    val packed = TextAnalysisOps.packSequences(docs, chunkLen = 256).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // per-doc spans sum to the doc's token count (nothing lost/padded)
    val byDoc = packed.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    val dl = docs.select(col("doc_id"),
        size(DedupOps.words(col("text"))).cast("long").as("dl"))
      .filter(col("dl") > 0).as[(Long, Long)].collect().toMap
    assert(byDoc == dl)
    // every chunk except the last is exactly full, spans are contiguous
    val byChunk = packed.groupBy(_._1)
    val lastChunk = byChunk.keys.max
    byChunk.foreach { case (cid, rows) =>
      val total = rows.map(_._4).sum
      if (cid != lastChunk) assert(total == 256L, s"chunk $cid not full: $total")
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 == b._3, s"gap in chunk $cid")
        case _ =>
      }
    }
    // the bucket count is an execution knob, never a semantic one
    val other = TextAnalysisOps.packSequences(docs, chunkLen = 256, nBuckets = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(other.toSet == packed.toSet)
  }

  test("chunks: full coverage, overlap carry, no subset chunks") {
    // 10 tokens, chunk 4, overlap 2 → starts 0,2,4,6 skip 8 (10-8 <= 2)
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, "x y")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysisOps.chunks(docs, 4, 2)
      .select("doc_id", "chunk_no", "n_chunk_tokens", "chunk_text")
      .as[(Long, Int, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 0, 4L, "a b c d"), (1L, 1, 4L, "c d e f"),
      (1L, 2, 4L, "e f g h"), (1L, 3, 4L, "g h i j"),
      (2L, 0, 2L, "x y")))
    // every token of doc 1 appears in at least one chunk
    val covered = got.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
    assert(covered == "a b c d e f g h i j".split(" ").toSet)
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysisOps.chunks(docs, 4, 4)
    }
  }

  test("redactPii scrubs emails, phones, IPs and counts them on the original") {
    val docs = Seq((1L, "mail a@b.co then 555-123-4567 from 1.2.3.4 twice 1.2.3.4"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysisOps.redactPii(docs)
      .select("clean_text", "n_emails", "n_phones", "n_ips")
      .as[(String, Int, Int, Int)].head()
    assert(got._1 == "mail <EMAIL> then <PHONE> from <IP> twice <IP>")
    assert((got._2, got._3, got._4) == (1, 1, 2))
  }

  test("rareBigramStats: shared bigrams are common, gibberish is rare, keep flag exact") {
    // docs 1-3 share every bigram (df=3); doc 9 is pure gibberish (df=1)
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"),
      (3L, "the quick brown fox"),
      (9L, "zxq wvut plonk fizz"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysisOps.rareBigramStats(docs, rareMax = 2, keepMax = 0.4)
      .select("doc_id", "n_bigrams", "n_rare", "rare_frac", "keep")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // shared docs: 3 bigrams each, df=3 > rareMax → zero rare, kept
    Seq(1L, 2L, 3L).foreach { id =>
      assert(got(id) == ((id, 3L, 0L, 0.0, true)))
    }
    // gibberish doc: all 3 bigrams have df=1 ≤ 2 → rare_frac 1.0, dropped
    assert(got(9L) == ((9L, 3L, 3L, 1.0, false)))
    // boundary: keep decides on the exact unrounded ratio
    val edge = Seq(
      (1L, "a b c d e f"), // 5 bigrams, all unique in this corpus... df=1 → frac 1.0
      (2L, "a b x"), (3L, "a b y"), (4L, "a b z"))
      .toDF("doc_id", "text")
    // "a b" appears in 4 docs (df=4, not rare at rareMax=2); doc 1's other
    // 4 bigrams are df=1 → rare_frac = 4/5 = 0.8 exactly
    val e1 = graft.operators.TextAnalysisOps.rareBigramStats(edge, rareMax = 2, keepMax = 0.8)
      .filter($"doc_id" === 1L)
      .select("rare_frac", "keep").as[(Double, Boolean)].head()
    assert(e1 == ((0.8, true))) // 0.8 ≤ 0.8 — boundary included, exact
  }

  test("tokenEntropy: hand-checked H, zero for single-type docs, norm null") {
    // doc 1 "a a b": H = 2/3·ln(3/2) + 1/3·ln 3; doc 2 "x x": H = 0 (ln 1)
    val docs = Seq((1L, "a a b"), (2L, "x x")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysisOps.tokenEntropy(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Option[Double])].collect().toList
    def r9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val h1 = r6(r9(2.0 / 3 * math.log(3.0 / 2)) + r9(1.0 / 3 * math.log(3.0)))
    val n1 = r6(h1 / math.log(2.0))
    assert(got == List(
      (1L, 2L, 3L, h1, Some(n1)),
      (2L, 1L, 2L, 0.0, None)))
  }

  test("gopherRules: each rule flag decided by exact integer arithmetic") {
    val docs = Seq(
      // 5 words, mean len (3+3+2+1+3)/5 = 2.4, "the" + "a" stops
      (1L, "the cat is a dog"),
      // 4 words, mean 4.0 exactly — boundary INCLUDED (40*4 == 160)
      (2L, "aaaa bbbb cccc dddd"),
      // symbol-heavy: 5 of 14 chars are symbols → sym_ok false
      (3L, "#### !!!! a bc"),
      // numeric words: alpha_frac 1/4 < 0.8 → alpha_ok false
      (4L, "12 34 56 ab"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysisOps.gopherRules(docs,
        minWords = 2, maxWords = 10, minMeanLenTenths = 40,
        maxMeanLenTenths = 100)
      .orderBy("doc_id")
      .select("doc_id", "n_words", "mean_word_len", "wc_ok", "len_ok",
        "sym_ok", "alpha_ok", "stop_ok", "keep")
      .as[(Long, Long, Double, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().toList
    assert(got == List(
      (1L, 5L, 2.4, true, false, true, true, true, false),
      (2L, 4L, 4.0, true, true, true, true, false, false),
      (3L, 2L, 1.5, true, false, false, true, false, false),
      (4L, 4L, 2.0, true, false, true, false, false, false)))
  }

  test("dsirSelect weights target-like docs above off-domain docs") {
    import org.apache.spark.sql.functions.col
    // 0-9 target (vocab A), 10-19 raw-but-target-like (vocab A),
    // 20-29 off-domain (vocab B), 30 empty (no evidence -> unscored)
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "omicron sigma tau upsilon phi chi psi omega"
    val docs = (0L to 19L).map(i => (i, a)) ++
      (20L to 29L).map(i => (i, b)) :+ ((30L, ""))
    val df = docs.toDF("doc_id", "text")
    val got = TextAnalysisOps.dsirSelect(df, col("doc_id") < 10, k = 40)
      .select("doc_id", "w").as[(Long, Double)].collect().toMap
    assert(!got.contains(30L), "empty doc must not be scored")
    val (aW, bW) = (got.filter(_._1 < 20).values, got.filter(_._1 >= 20).values)
    assert(aW.min > bW.max,
      s"every vocab-A doc must outweigh every vocab-B doc: $got")
    // deterministic Gumbel -> rerun-identical selection
    val again = TextAnalysisOps.dsirSelect(df, col("doc_id") < 10, k = 40)
      .select("doc_id", "w").as[(Long, Double)].collect().toMap
    assert(again == got)
  }
}
