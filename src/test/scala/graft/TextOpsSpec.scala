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

  test("topKWords counts and orders deterministically") {
    val docs = Seq((1L, "b a a"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextOps.topKWords(docs, 2).as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 3L), ("b", 2L)))
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
}
