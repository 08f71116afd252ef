package graft

import graft.functions.{ArrayDot, MinHashSignature, SrpCodes}
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
