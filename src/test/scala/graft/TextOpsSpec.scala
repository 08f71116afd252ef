package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenizer matches the reference pattern on tricky inputs") {
    val got = Seq((1L, """Hello, world! #tag @user don't it's-a x_1 "q""""))
      .toDF("doc_id", "text")
      .select(TextOps.tokens($"text").as("toks"))
      .as[Seq[String]].head()
    assert(got == Seq("hello", ",", "world", "!", "#tag", "@user", "don't",
      "it's", "-a", "x_1", "\"", "q", "\""))
  }

  test("case-fold order: fold-first keeps DON'T one token (pinned divergence)") {
    // The reference matches raw text then lowercases, which would split
    // DON'T into don,t (the '[a-z]{1,3} suffix is lowercase-only); our
    // fold-first semantics — documented on TextOps.tokens — yields the
    // single token don't regardless of input case. This test pins the
    // chosen behavior so a silent reordering of lower() vs match fails.
    val toks = Seq((1L, """DON'T SHOUT IT'S O'BRIEN"""))
      .toDF("doc_id", "text")
      .select(TextOps.tokens($"text").as("toks")).as[Seq[String]].head()
    // reference order would split every apostrophe instead:
    // don / t / shout / it / s / o / brien
    assert(toks == Seq("don't", "shout", "it's", "o'bri", "en"))
    // and case never changes token boundaries
    val lower = Seq((1L, """don't shout it's o'brien"""))
      .toDF("doc_id", "text")
      .select(TextOps.tokens($"text").as("toks")).as[Seq[String]].head()
    assert(toks == lower)
  }

  test("topKWords counts and orders deterministically") {
    val docs = Seq((1L, "b a a"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextOps.topKWords(docs, 2).as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 3L), ("b", 2L)))
  }

  test("tfidf and bm25 match hand-computed scores on a two-doc corpus") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    // N=2; df: a=2, b=1, c=1 → idf(a)=ln(1)=0, idf(b)=idf(c)=ln(2)
    val tfidf = TextOps.tfidfTopTerms(docs, 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(tfidf((1L, "a")) == 0.0)
    assert(math.abs(tfidf((1L, "b")) - math.log(2.0)) < 1e-12)
    assert(math.abs(tfidf((2L, "c")) - math.log(2.0)) < 1e-12)
    // bm25: dl(1)=3, dl(2)=2, avgdl=2.5; idf_bm25(b)=ln((0.5+0.5)/1.5+1)...
    // for b: ln((2-1+0.5)/(1+0.5)+1)=ln(2); denom(1,b)=1+1.2*(0.25+0.75*3/2.5)
    val bm25 = TextOps.bm25TopTerms(docs, 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    val expB = math.log(2.0) * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 3 / 2.5))
    assert(math.abs(bm25((1L, "b")) - expB) < 1e-12)
    // the ubiquitous term scores ln(1.2)-scaled, still positive (BM25+1 form)
    assert(bm25((1L, "a")) > 0 && bm25((2L, "a")) > 0)
    // rarer term outranks the ubiquitous one within each doc
    assert(bm25((1L, "b")) > bm25((1L, "a")))
    assert(bm25((2L, "c")) > bm25((2L, "a")))
  }

  test("charHistogram reproduces the reference's worked example (population std-dev)") {
    // Spec example (Assignment 1 Description.htm): docs ['a bacd a','cda','bcd'];
    // char 'a' appears 3,1,0 times -> mean 4/3, population std sqrt(14/9).
    // (The spec prints 1.52 = sample std-dev; the reference CODE divides by n
    // — MRSystemSimulator2020.py:243-244 — and we pin the code's semantics.)
    val docs = Seq((1L, "a bacd a"), (2L, "cda"), (3L, "bcd")).toDF("doc_id", "text")
    val m = TextOps.charHistogram(docs).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m("a") == (1.3333, 1.2472))
    assert(m("b") == (0.6667, 0.4714))
    assert(m("z") == (0.0, 0.0))
    assert(m.size == 26)
  }

  test("q_topk_words smoke on sf0.001") {
    val df = SparkEntry.queries("q_topk_words")(spark, sf0)
    assert(df.count() > 0)
  }

  test("bpePairCounts: occurrence-weighted pair counts, 1-char words pairless") {
    // "abab" ×3 occurrences → pairs ab(×2 per word), ba(×1); "ab" ×2 → ab
    // ⇒ ab: 3·2 + 2·1 = 8, ba: 3·1 = 3; "a" and "." contribute nothing
    val docs = Seq((1L, "abab abab ab a ."), (2L, "abab ab")).toDF("doc_id", "text")
    val got = graft.operators.TextOps.bpePairCounts(docs, 10)
      .as[(String, Long)].collect().toList
    assert(got.head == (("ab", 8L)))
    assert(got.contains(("ba", 3L)))
    assert(!got.exists(_._1.length != 2))
    // equal counts tie-break on the pair string
    val sorted = got.sortBy { case (p, n) => (-n, p) }
    assert(got == sorted)
  }

  test("bpeMerges: hand-checked merge sequence + greedy overlap + applied vocab") {
    // corpus: "abab" ×3, "abc" ×2, "aaaa" ×1 (as three docs)
    // round 1 pairs: (a,b): abab has 2, abc has 1 → 3·2? No — vocab-weighted:
    //   abab freq 3 → (a,b)×2·3=6, (b,a)×1·3=3; abc freq 2 → (a,b)×2, (b,c)×2;
    //   aaaa freq 1 → (a,a)×3
    //   (a,b)=8 wins → merge: abab→[ab,ab], abc→[ab,c], aaaa unchanged
    // round 2: (ab,ab)×3, (ab,c)×2, (a,a)×3 → tie 3 vs 3 → (a,a) < (ab,ab)
    //   lexicographically on (l,r): l "a" < "ab" → (a,a) wins, n=3
    //   greedy left-to-right on aaaa: [aa, aa] (NOT 3 overlapping merges)
    // round 3: (ab,ab)=3 wins → abab→[abab]
    // round 4: (aa,aa)×1, (ab,c)×2 → (ab,c) wins → abc→[abc]
    val docs = Seq((1L, "abab abab abc"), (2L, "abab abc"), (3L, "aaaa"))
      .toDF("doc_id", "text")
    val got = TextOps.bpeMerges(docs, rounds = 4, vocabTopK = 10)
      .as[(Int, String, String, String, Long)].collect().toList
    val merges = got.filter(_._2 == "merge").sortBy(_._1)
    assert(merges == List(
      (1, "merge", "a", "b", 8L),
      (2, "merge", "a", "a", 3L),
      (3, "merge", "ab", "ab", 3L),
      (4, "merge", "ab", "c", 2L)))
    // final vocab: abab(3), abc(2), aa(2 from [aa,aa]×1) — merges APPLIED
    val vocab = got.filter(_._2 == "vocab").map(v => (v._3, v._5)).toSet
    assert(vocab == Set(("abab", 3L), ("abc", 2L), ("aa", 2L)))
  }

  test("bpeEncode: train-split merges applied to held-out eval docs") {
    // evalMod=2: train = odd doc_ids {1,3}, eval = even {2}
    // train freqs: abab×3, abc×2
    //   round 1: (a,b) = 3·2 + 2·1 = 8 wins → abab→[ab,ab], abc→[ab,c]
    //   round 2: (ab,ab)=3 beats (ab,c)=2 → abab→[abab]
    // eval doc 2 = "abab abc xy ab":
    //   abab→[abab] (1), abc→[ab,c] (2), xy→[x,y] (2 — no trained merge
    //   applies to unseen chars), ab→[ab] (1) ⇒ 4 words, 6 tokens
    val docs = Seq((1L, "abab abab abc"), (2L, "abab abc xy ab"),
      (3L, "abab abc")).toDF("doc_id", "text")
    val got = TextOps.bpeEncode(docs, rounds = 2, evalMod = 2)
      .as[(Long, Long, Long, Double)].collect().toList
    assert(got == List((2L, 4L, 6L, 1.5)))
  }

  test("bigramNll: hand-checked add-one bigram LM averages") {
    // corpus: doc1 = a b a b, doc2 = a a, doc3 = x (no bigrams → dropped)
    // V = 3 {a,b,x}; c1: a=4, b=2, x=1
    // doc1 bigrams (a,b)(b,a)(a,b): c2(a,b)=2, c2(b,a)=1
    //   terms: ln((4+3)/(2+1)), ln((2+3)/(1+1)), ln(7/3)
    // doc2 bigram (a,a): c2(a,a)=1 → ln((4+3)/(1+1))
    val docs = Seq((1L, "a b a b"), (2L, "a a"), (3L, "x"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextOps.bigramNll(docs, keepBelow = 1.0)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Boolean)].collect().toList
    def r9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = r6((r9(math.log(7.0 / 3)) * 2 + r9(math.log(5.0 / 2))) / 3)
    val d2 = r6(math.log(7.0 / 2))
    assert(got == List((1L, 3L, d1, d1 <= 1.0), (2L, 1L, d2, d2 <= 1.0)))
    assert(got.head._4 && !got(1)._4) // threshold splits the corpus
  }

  test("naiveBayes: hand-checked argmax, OOV smoothing, tie to smaller class") {
    // train (doc_id % 5 != 0): class p = {"x x y", "x"}  (n_p=4: x=3, y=1)
    //                          class q = {"z z"}         (n_q=2: z=2)
    // V = 3 {x,y,z}; priors: p → ln(2/3), q → ln(1/3)
    // eval doc 0 = "x x": p: 2·ln(4/7)+ln(2/3)  q: 2·ln(1/5)+ln(1/3) → p wins
    // eval doc 5 = "w" (OOV): p: ln(1/7)+ln(2/3)  q: ln(1/5)+ln(1/3)
    //   p: −1.945910149−0.405465108 = −2.351375257
    //   q: −1.609437912−1.098612289 = −2.708050201 → p wins (less negative)
    val docs = Seq((1L, "p", "x x y"), (2L, "p", "x"), (3L, "q", "z z"),
      (0L, "p", "x x"), (5L, "q", "w")).toDF("doc_id", "lang", "text")
    val got = TextOps.naiveBayes(docs, labelCol = "lang", evalMod = 5)
      .orderBy("doc_id")
      .as[(Long, String, String, Boolean, Double)].collect().toList
    def r9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d0 = r6((BigDecimal(r9(math.log(4.0 / 7))) * 2
      + BigDecimal(r9(math.log(2.0 / 3)))).toDouble)
    val d5 = r6(r9(math.log(1.0 / 7)) + r9(math.log(2.0 / 3)))
    assert(got == List((0L, "p", "p", true, d0), (5L, "q", "p", false, d5)))

    // exact tie: symmetric classes → identical scores → smaller label wins
    val tied = Seq((1L, "a", "s t"), (2L, "b", "s t"), (0L, "b", "s"))
      .toDF("doc_id", "lang", "text")
    val t = TextOps.naiveBayes(tied, labelCol = "lang", evalMod = 5)
      .as[(Long, String, String, Boolean, Double)].collect().toList
    assert(t.map(r => (r._1, r._3)) == List((0L, "a")))
  }

  test("trigramBackoffNll: all three backoff branches, hand-checked") {
    // train: c3(a,b,c)=1 c3(b,c,a)=2 c3(c,a,b)=1 c3(a,b,d)=1;
    //        c2: ab=2 bc=2 ca=2 bd=1; c1: a=3 b=3 c=2 d=1; T=9 V=4
    val train = Seq((1L, "a b c a b d"), (2L, "b c a")).toDF("doc_id", "text")
    // doc 0: (d,b,c) → trigram+history unseen, (b,c) seen → BIGRAM branch
    //        (b,c,x) → (c,x) unseen, x OOV → UNIGRAM floor branch
    // doc 5: (a,b,c) c3=1/ab=2, (b,c,a) c3=2/bc=2 → TRIGRAM branch twice
    val eval = Seq((0L, "d b c x"), (5L, "a b c a")).toDF("doc_id", "text")
    val got = graft.operators.TextOps.trigramBackoffNll(train, eval)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toList
    def r9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d0 = r6((r9(-math.log(0.4 * 2 / 3.0)) + r9(-math.log(0.4 * 0.4 * 1 / 13.0))) / 2)
    val d5 = r6((r9(-math.log(1 / 2.0)) + r9(-math.log(2 / 2.0))) / 2)
    assert(got == List(
      (0L, 2L, 0L, 1L, 1L, d0),
      (5L, 2L, 2L, 0L, 0L, d5)))
  }

  test("tokenLabelMi: separating token maxes MI, uniform token scores 0") {
    // 4 docs, 2 classes: "alpha" appears exactly in class a docs
    // (perfect separator), "common" in all docs (zero information)
    val docs = Seq(
      (0L, "alpha common", "a"), (1L, "alpha common", "a"),
      (2L, "beta common", "b"), (3L, "gamma common", "b"))
      .toDF("doc_id", "text", "lang")
    val got = TextOps.tokenLabelMi(docs, labelCol = "lang", k = 10)
      .as[(String, Double)].collect().toMap
    // perfect separator: MI = H(C) = ln 2 (two equal classes)
    def r9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln2Term = r9(0.5 * math.log(2.0))
    assert(got("alpha") == r6(ln2Term + ln2Term))
    assert(got("common") == 0.0)
    // half-separator beta: present in 1 of 4 docs, all class b
    assert(got("beta") > 0.0 && got("beta") < got("alpha"))
  }

  test("windowedCooccur: window semantics, unordered pairs, marginal PPMI") {
    // one doc "x y z x": window 2 pairs (offsets 1,2):
    //  d=1: (x,y) (y,z) (x,z)  d=2: (x,z) (x,y)  -> (x,y):2 (x,z):2 (y,z):1
    val docs = Seq((0L, "x y z x")).toDF("doc_id", "text")
    val got = TextOps.windowedCooccur(docs, window = 2, minCount = 1)
      .as[(String, String, Long, Double)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    assert(got.keySet == Set(("x", "y"), ("x", "z"), ("y", "z")))
    assert(got(("x", "y"))._1 == 2L && got(("x", "z"))._1 == 2L && got(("y", "z"))._1 == 1L)
    // ppmi replay: t=5; m(x)=4, m(y)=3, m(z)=3
    def r9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("y", "z"))._2 == r6(math.max(0.0, r9(math.log(1.0 * 5 / (3 * 3))))))
    assert(got(("x", "y"))._2 == r6(math.max(0.0, r9(math.log(2.0 * 5 / (4 * 3))))))
    // minCount filters the singleton pair but keeps its mass in marginals
    val filtered = TextOps.windowedCooccur(docs, window = 2, minCount = 2)
      .as[(String, String, Long, Double)].collect()
    assert(filtered.map(r => (r._1, r._2)).toSet == Set(("x", "y"), ("x", "z")))
    assert(filtered.find(r => (r._1, r._2) == (("x", "y"))).get._4 == got(("x", "y"))._2)
  }

  test("textRank: scalar replay of the damped 9-dp fixpoint on a star graph") {
    // star c—x (9 pairs), c—y (9 pairs): W_c=18 (frac 1/2 each way out),
    // W_x=W_y=9 (frac 1) — the hub must outrank the leaves
    val docs = Seq((1L, "c x c x c x c x c x"), (2L, "c y c y c y c y c y"))
      .toDF("doc_id", "text")
    val got = TextOps.textRank(docs, window = 1, minCount = 2, rounds = 5)
      .orderBy("word").as[(String, Long, Double)].collect().toList
    def r9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var r = Map("c" -> r9(1.0 / 3), "x" -> r9(1.0 / 3), "y" -> r9(1.0 / 3))
    for (_ <- 1 to 5) {
      val contrib = Map( // decimal-sum of 9-dp terms, like the engine
        "c" -> (BigDecimal(r9(1.0 * r("x"))) + BigDecimal(r9(1.0 * r("y")))).toDouble,
        "x" -> r9(0.5 * r("c")),
        "y" -> r9(0.5 * r("c")))
      r = r.map { case (k, _) => k -> r9((1.0 - 0.85) / 3 + 0.85 * contrib(k)) }
    }
    assert(got == List(("c", 18L, r6(r("c"))), ("x", 9L, r6(r("x"))),
      ("y", 9L, r6(r("y")))))
    assert(r("c") > r("x") && r("x") == r("y"))
  }

  test("zipfFit: exact power law freq = 60/rank gives slope -1, r2 = 1") {
    val words = Seq("a" -> 60, "b" -> 30, "c" -> 20, "d" -> 15, "e" -> 12,
      "f" -> 10)
    val text = words.flatMap { case (w, k) => Seq.fill(k)(w) }.mkString(" ")
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val (n, slope, r2) = TextOps.zipfFit(docs, topN = 6)
      .select("n", "slope", "r2").as[(Long, Double, Double)].head()
    assert(n == 6L)
    assert(math.abs(slope + 1.0) < 1e-4)
    assert(r2 > 0.999999)
  }

  test("heapsFit: exact linear vocab growth reads beta = 1; a closed" +
      " vocabulary flatlines at 0") {
    // doc d holds tokens 4d..4d+3, each word w appears at doc w/4 first
    // and NEVER again -> after d docs: n_tok = 4d, vocab = 4d = n_tok^1
    // (beta = 1, exact line in ln-ln space)
    val open = (0L until 64L).map(d =>
      (d, (0 until 4).map(i => s"w${4 * d + i}").mkString(" ")))
      .toDF("doc_id", "text")
    val o = TextOps.heapsFit(open, nCheckpoints = 8)
      .select("ck", "n_tok", "vocab", "beta", "r2")
      .as[(Long, Long, Long, Double, Double)].collect().toList
    assert(o.size == 8 && o.forall { case (_, n, v, _, _) => n == v })
    assert(math.abs(o.head._4 - 1.0) < 1e-4 && o.head._5 > 0.999999)

    // same 3 words everywhere -> vocab constant -> beta 0 (and +0.0,
    // not -0.0: the publish strips the IEEE sign)
    val closed = (0L until 64L).map(d => (d, "a b c a b c"))
      .toDF("doc_id", "text")
    val c = TextOps.heapsFit(closed, nCheckpoints = 8)
      .select("vocab", "beta").as[(Long, Double)].collect().toList
    assert(c.forall(_._1 == 3L))
    assert(c.head._2 == 0.0
      && java.lang.Double.doubleToLongBits(c.head._2) == 0L)
  }

  test("kneserNeyBigrams: hand-computed statistics and probabilities") {
    // docs: "a b a b c" + "b c" → c2: (a,b)=2, (b,a)=1, (b,c)=2
    // byW1: a → c1h 2, follow 1; b → c1h 3, follow 2
    // byW2: every w2 has exactly one predecessor type; n_types = 3
    val docs = Seq((1L, "a b a b c"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextOps.kneserNeyBigrams(docs, k = 10)
      .select("w1", "w2", "c2", "c1h", "n_follow", "n_prec", "n_types", "p_kn")
      .as[(String, String, Long, Long, Long, Long, Long, Double)]
      .collect().toList
    // order: c2 desc then (w1, w2) — ties at c2=2 break a < b
    assert(out.map(r => (r._1, r._2)) == List(("a","b"), ("b","c"), ("b","a")))
    val byPair = out.map(r => (r._1, r._2) -> r).toMap
    // p_kn(a,b) = (2-.75)/2 + .75*1/2*(1/3) = 0.75
    assert(byPair(("a","b"))._8 == 0.75)
    // p_kn(b,a) = (1-.75)/3 + .75*2/3*(1/3) = 0.25
    assert(byPair(("b","a"))._8 == 0.25)
    // p_kn(b,c) = (2-.75)/3 + .75*2/3*(1/3) = 0.583333333
    assert(byPair(("b","c"))._8 == 0.583333333)
    // interpolated KN normalizes over the FULL vocab: for history b,
    // p(b,a) + p(b,c) + λ(b)·Pcont(b) = 0.25 + 0.583̅ + (.75·2/3)(1/3) = 1
    assert(math.abs(byPair(("b","a"))._8 + byPair(("b","c"))._8
      + 0.75 * 2.0 / 3.0 * (1.0 / 3.0) - 1.0) < 2e-9)
    assert(byPair(("a","b"))._4 == 2L && byPair(("b","c"))._4 == 3L)
    assert(out.forall(_._7 == 3L))
  }

  test("chiSquaredTerms: 2x2 contingency by hand, degenerate margin -> 0") {
    // docs: en:"cat dog", en:"cat", fr:"dog"; n=3, n1=2
    // cat: a=2,ta=2 → diff = 2·1 − 0·0 = 2, chi2 = 3·4/(2·1·2·1) = 3.0
    // dog: a=1,ta=2 → diff = 1·0 − 1·1 = −1, chi2 = 3·1/4 = 0.75
    val docs = Seq(("en", "cat dog"), ("en", "cat"), ("fr", "dog"))
      .toDF("lang", "text")
    val out = TextOps.chiSquaredTerms(docs, col("lang") === "en", k = 10)
      .select("token", "a", "ta", "chi2")
      .as[(String, Long, Long, Double)].collect().toList
    assert(out == List(("cat", 2L, 2L, 3.0), ("dog", 1L, 2L, 0.75)))
    // a token present in EVERY doc has a zero margin → published 0, not NaN
    val allIn = Seq(("en", "x y"), ("fr", "x")).toDF("lang", "text")
    val z = TextOps.chiSquaredTerms(allIn, col("lang") === "en", k = 10)
      .select("token", "chi2").as[(String, Double)].collect().toMap
    assert(z("x") == 0.0)
    assert(z("y") == 2.0) // a=1,ta=1: diff=1·1−0·1=1 → 2·1/(1·1·1·1)=2
  }

  test("goodTuring: count-of-counts spectrum and r* by hand") {
    // "a", "a b", "a b c" → counts a=3, b=2, c=1 → N_1=N_2=N_3=1,
    // T=6, p0 = 1/6; r*(1) = 2·1/1 = 2, r*(2) = 3, r*(3) = 0 (no N_4)
    val docs = Seq((1L, "a"), (2L, "a b"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val got = TextOps.goodTuring(docs, maxR = 10)
      .select("r", "n_r", "n_next", "r_star", "p_unseen")
      .as[(Long, Long, Long, Double, Double)].collect().toList
    assert(got == List(
      (1L, 1L, 1L, 2.0, 0.166666667),
      (2L, 1L, 1L, 3.0, 0.166666667),
      (3L, 1L, 0L, 0.0, 0.166666667)))
  }

  test("jsDivergence: 0 on identical slices, ln 2 on disjoint ones") {
    val same = TextOps.jsDivergence(
      Seq((1L, "x x")).toDF("doc_id", "text"),
      Seq((2L, "x x")).toDF("doc_id", "text")).head()
    assert(same.getAs[Double]("jsd") == 0.0)
    assert(same.getAs[Long]("n_types_a") == 1L)
    // fully disjoint unigram distributions: JSD = ln 2 (the bound)
    val disj = TextOps.jsDivergence(
      Seq((1L, "x")).toDF("doc_id", "text"),
      Seq((2L, "y")).toDF("doc_id", "text")).head()
    assert(disj.getAs[Double]("jsd") == 0.693147)
    assert(disj.getAs[Double]("kl_a_to_m") == 0.693147)
  }

  test("chao1Richness: singleton/doubleton hand case; saturated vocab estimates itself") {
    val docs = Seq(
      ("en", "a a b c"),   // V=3, F1=2 (b,c), F2=1 (a) → 3 + 2·1/(2·2) = 3.5
      ("de", "x x y y")    // V=2, F1=0, F2=2 → chao1 = V exactly
    ).toDF("lang", "text")
    val got = TextOps.chao1Richness(docs).orderBy("lang")
      .as[(String, Long, Long, Long, Long, Double)].collect().toList
    assert(got == List(
      ("de", 4L, 2L, 0L, 2L, 2.0),
      ("en", 4L, 3L, 2L, 1L, 3.5)))
  }
}
