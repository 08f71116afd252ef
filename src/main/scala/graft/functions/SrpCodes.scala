package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
    extends UnaryExpression {

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

  /** Whole-stage-codegen body: same triple loop as straight-line Java. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = classOf[XXH64].getName
      val dim = ctx.freshName("dim")
      val codes = ctx.freshName("codes")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val code = ctx.freshName("code")
      val plane = ctx.freshName("plane")
      val dot = ctx.freshName("dot")
      s"""int $dim = $c.numElements();
         |long[] $codes = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $code = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    long $plane = (long) ($t * $bits + $j);
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $dot += (($xxh.hashLong(($plane << 32) | $d, 42L) & 1L) == 1L)
         |        ? (double) $c.getFloat($d) : -((double) $c.getFloat($d));
         |    }
         |    if ($dot > 0) $code |= (1L << $j);
         |  }
         |  $codes[$t] = $code;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);""".stripMargin
    })

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
