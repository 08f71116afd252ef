package graft

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL users reach the native expressions after registration") {
    GraftExtensions.register(spark)
    Seq((1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("id", "a", "b").createOrReplaceTempView("g_vecs")
    val dot = spark.sql("SELECT array_dot(a, b) FROM g_vecs").head().getDouble(0)
    assert(dot == 32.0) // 4 + 10 + 18

    Seq((1L, Seq("alpha", "beta", "gamma")))
      .toDF("id", "toks").createOrReplaceTempView("g_toks")
    val sig = spark.sql("SELECT minhash_sig(toks, 16) AS s FROM g_toks")
      .selectExpr("size(s)").head().getInt(0)
    assert(sig == 16)

    // SQL result equals the DataFrame-API result exactly
    val viaSql = spark.sql("SELECT minhash_sig(toks, 16) AS s FROM g_toks")
      .selectExpr("s[0]", "s[15]").head()
    val viaDf = Seq(Seq("alpha", "beta", "gamma")).toDF("toks")
      .select(graft.functions.MinHashSignature($"toks", 16).as("s"))
      .selectExpr("s[0]", "s[15]").head()
    assert(viaSql == viaDf)

    val codes = spark.sql("SELECT srp_codes(a, 4, 6) AS c FROM g_vecs")
      .selectExpr("size(c)").head().getInt(0)
    assert(codes == 4)

    val sh = spark.sql("SELECT md5_simhash(toks, 60) AS s, md5_min_shingle(toks) AS m FROM g_toks")
      .head()
    val shDf = Seq(Seq("alpha", "beta", "gamma")).toDF("toks")
      .select(graft.functions.Md5SimHash($"toks", 60).as("s"),
        graft.functions.Md5MinShingle($"toks").as("m")).head()
    assert(sh == shDf)
  }

  test("nfc_normalize: composes sequences, maps singletons, identity on normalized text") {
    GraftExtensions.register(spark)
    Seq(
      ("cafe\u0301", "caf\u00E9"),          // combining acute composes
      ("\u212B", "\u00C5"),                  // ANGSTROM SIGN singleton
      ("plain ascii", "plain ascii"),        // fast path: untouched
      ("caf\u00E9", "caf\u00E9")             // already composed: identity
    ).toDF("raw", "expected").createOrReplaceTempView("g_nfc")
    val rows = spark.sql(
      "SELECT nfc_normalize(raw) = expected, octet_length(nfc_normalize(raw)), octet_length(raw) FROM g_nfc")
      .collect()
    assert(rows.forall(_.getBoolean(0)), rows.mkString(","))
    // the decomposed input really shrank (6 -> 5 bytes)
    assert(rows.head.getInt(1) == 5 && rows.head.getInt(2) == 6)
    // Column-API form agrees with the SQL form
    val viaCol = spark.table("g_nfc")
      .select(graft.functions.NfcNormalize(org.apache.spark.sql.functions.col("raw")))
      .as[String].collect().toSeq
    val viaSql = spark.sql("SELECT nfc_normalize(raw) FROM g_nfc")
      .as[String].collect().toSeq
    assert(viaCol == viaSql)
    // null propagates, not crashes
    assert(spark.sql("SELECT nfc_normalize(CAST(NULL AS STRING))").head().isNullAt(0))
  }

  test("non-literal structural arguments are rejected with a clear error") {
    GraftExtensions.register(spark)
    Seq((1L, Seq("x"))).toDF("id", "toks").createOrReplaceTempView("g_toks2")
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(toks, id) FROM g_toks2").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }
}
