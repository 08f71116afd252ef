package graft

import graft.functions.{ArrayDot, Md5SimHash, MinHashSignature, SrpCodes}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The native expressions ship BOTH an interpreted eval and a
  * doGenCode body; the two must agree bit-for-bit (a silent divergence
  * would poison dedup/similarity results only in codegen'd stages —
  * i.e. only in production).
  */
class CodegenParitySpec extends SparkSpec {
  import spark.implicits._

  private def floats(xs: Float*) =
    Literal.create(xs, ArrayType(FloatType, containsNull = false))

  test("ArrayDot: interpreted eval equals the codegen'd DataFrame path") {
    val xs = Seq(0.5f, -1.25f, 3.0f, 1e-7f, 42.0f)
    val interp = ArrayDot(floats(xs: _*), floats(xs: _*)).eval(null)
      .asInstanceOf[Double]
    val viaDf = Seq(xs).toDF("a").repartition(1)
      .select(ArrayDot($"a", $"a").as("d")).head().getDouble(0)
    assert(interp == viaDf)
  }

  test("MinHashSignature: interpreted equals codegen for string and long elements") {
    val strs = Literal.create(Seq("alpha", "beta", "gamma"),
      ArrayType(StringType, containsNull = false))
    val interpS = MinHashSignature(strs, 8).eval(null)
      .asInstanceOf[ArrayData].toLongArray().toSeq
    val viaDfS = Seq(Seq("alpha", "beta", "gamma")).toDF("a").repartition(1)
      .select(MinHashSignature($"a", 8).as("s")).head()
      .getSeq[Long](0)
    assert(interpS == viaDfS.toSeq)

    val longs = Literal.create(Seq(11L, -7L, 123456789L),
      ArrayType(LongType, containsNull = false))
    val interpL = MinHashSignature(longs, 8).eval(null)
      .asInstanceOf[ArrayData].toLongArray().toSeq
    val viaDfL = Seq(Seq(11L, -7L, 123456789L)).toDF("a").repartition(1)
      .select(MinHashSignature($"a", 8).as("s")).head()
      .getSeq[Long](0)
    assert(interpL == viaDfL.toSeq)
  }

  test("Md5SimHash: interpreted equals codegen, and equals the SQL bit construction") {
    val toks = Seq("the", "quick", "brown", "fox", "the", "the")
    val tokLit = Literal.create(toks, ArrayType(StringType, containsNull = false))
    val interp = Md5SimHash(tokLit, 60).eval(null).asInstanceOf[Long]
    val viaDf = Seq(toks).toDF("a").repartition(1)
      .select(Md5SimHash($"a", 60).as("s")).head().getLong(0)
    assert(interp == viaDf)
    // portable-SQL reference: tf-weighted per-bit vote over
    // conv(substring(md5(token),1,15),16,10), as the DuckDB oracle does
    val sqlRef = Seq(toks).toDF("a").repartition(1)
      .select(explode($"a").as("t"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))
      .withColumn("h", conv(substring(md5($"t".cast("binary")), 1, 15), 16, 10).cast("long"))
      .withColumn("i", explode(sequence(lit(0), lit(59))))
      .withColumn("pm", when(expr("(h >> i) & 1") === 1, $"cnt").otherwise(-$"cnt"))
      .groupBy("i").agg(sum($"pm").as("w"))
      .agg(sum(when($"w" > 0, expr("shiftleft(CAST(1 AS BIGINT), i)")).otherwise(lit(0L))).as("sig"))
      .head().getLong(0)
    assert(interp == sqlRef)
  }

  test("JaroWinkler: interpreted equals codegen; DuckDB-builtin pinned doubles") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.JaroWinkler
    // Pins are the oracle builtin's EXACT doubles (DuckDB probe, this
    // repo's bit-parity contract): transposition, window clipping,
    // prefix boost + cap, sub-0.7 no-boost, differing-first-char
    // no-boost, identity, disjoint, empty convention.
    val pinned = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("duane", "dwayne", 0.8400000000000001),
      ("aaaaaaaa", "aaaaaaab", 0.95), // prefix cap at 4
      ("crate", "trace", 0.7333333333333334), // jaro>0.7 but p=0
      ("zyx", "xyz", 0.5555555555555555), // below boost threshold
      ("abcd", "abcd", 1.0),
      ("a", "b", 0.0),
      ("", "x", 0.0), ("x", "", 0.0), ("", "", 0.0)) // empty → 0, incl. both
    pinned.foreach { case (a, b, want) =>
      val interp = JaroWinkler.compute(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(interp == want, s"interp ($a, $b)")
      val viaDf = Seq((a, b)).toDF("a", "b").repartition(1)
        .select(JaroWinkler($"a", $"b").as("jw")).head().getDouble(0)
      assert(viaDf == want, s"codegen ($a, $b)")
    }
    // symmetry on asymmetric-length inputs (window derives from max)
    assert(JaroWinkler.compute(UTF8String.fromString("dixon"),
        UTF8String.fromString("dicksonx")) ==
      JaroWinkler.compute(UTF8String.fromString("dicksonx"),
        UTF8String.fromString("dixon")))
  }

  test("SrpCodes: interpreted equals codegen on testdata vectors") {
    val emb = Tables.embeddings(spark, sf0).limit(20).collect()
      .map(_.getSeq[Float](1))
    emb.foreach { v =>
      val interp = SrpCodes(floats(v: _*), 4, 6).eval(null)
        .asInstanceOf[ArrayData].toLongArray().toSeq
      val viaDf = Seq(v).toDF("a").repartition(1)
        .select(SrpCodes($"a", 4, 6).as("c")).head().getSeq[Long](0)
      assert(interp == viaDf.toSeq)
    }
  }
}
