package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Signed-random-projection LSH codes for a float-array embedding:
  * `tables` codes of `bits` bits; bit j of table t is the sign of the
  * projection onto a deterministic ±1 hyperplane (xxHash64 of the
  * (plane, dim) pair — no stored model, reproducible everywhere).
  *
  * Native loop for the same reason as [[ArrayDot]]/[[MinHashSignature]]:
  * the tables×bits×dim work per row (3k+ ops) is ~1000× cheaper here
  * than as interpreted nested higher-order functions.
  */
case class SrpCodes(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"srp_codes expects array<float>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val dim = x.numElements()
    val codes = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var code = 0L
      var j = 0
      while (j < bits) {
        val plane = (t * bits + j).toLong
        var dot = 0.0
        var d = 0
        while (d < dim) {
          val sign = if ((XXH64.hashLong((plane << 32) | d, 42L) & 1L) == 1L) 1.0 else -1.0
          dot += x.getFloat(d).toDouble * sign
          d += 1
        }
        if (dot > 0) code |= (1L << j)
        j += 1
      }
      codes(t) = code
      t += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): SrpCodes =
    copy(child = newChild)

  override def prettyName: String = "srp_codes"
}

object SrpCodes {
  def apply(c: Column, tables: Int, bits: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SrpCodes(ColumnBridge.expression(c), tables, bits))
  }
}
