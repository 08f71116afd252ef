package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** SimHash signature (Charikar 2002) of a token array in ONE per-row
  * loop: bit i of the result is the sign of Σ_occurrences ±1, where the
  * ±1 is bit i of the token's 60-bit md5-derived hash (the same
  * `('0x' || substring(md5(token), 1, 15))::BIGINT` value the DuckDB
  * oracle computes, so results stay engine-portable bit for bit).
  *
  * Passing the RAW token array (with repetitions) is equivalent to the
  * tf-weighted formulation — Σ_tokens tf·(±1) = Σ_occurrences ±1 — so
  * no per-doc token counting is needed. That collapses the previous
  * 5-operator plan (explode → tf groupBy → 60× bit explode → per-bit
  * groupBy → per-doc groupBy; TWO wide shuffles + a 60× row expansion)
  * into a single shuffle-free projection: the kernel is pure per-row
  * compute, exactly what a 1000-executor scan wants.
  */
case class Md5SimHash(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if bits >= 1 && bits <= 60 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckFailure(s"md5_simhash bits must be in [1, 60], got $bits")
      case other =>
        TypeCheckResult.TypeCheckFailure(s"md5_simhash expects array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    Md5SimHash.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5SimHash.compute($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Md5SimHash =
    copy(child = newChild)

  override def prettyName: String = "md5_simhash"
}

object Md5SimHash {

  private val mdPool =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Called from both interpreted eval and generated code. */
  def compute(arr: ArrayData, bits: Int): Long = {
    val md = mdPool.get()
    val w = new Array[Int](bits)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        val h = md.digest()
        // first 15 hex chars = leading 60 bits of the digest, as in the
        // portable SQL form (big-endian first 8 bytes >>> 4)
        var be = 0L
        var k = 0
        while (k < 8) { be = (be << 8) | (h(k) & 0xffL); k += 1 }
        val v = be >>> 4
        var b = 0
        while (b < bits) {
          w(b) += (if (((v >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (w(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def apply(c: Column, bits: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(Md5SimHash(ColumnBridge.expression(c), bits))
  }
}
