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
  *
  * The ±1 hyperplane matrix is ROW-INVARIANT — it depends only on
  * (plane, dim), never on the input vector — so it is materialized once
  * per JVM in [[SrpCodes.signTable]] (a few KB) instead of re-deriving
  * tables×bits×dim xxHash64 calls for every row: per-row work drops to
  * the pure multiply-accumulate loop.
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
    val signs = SrpCodes.signTable(tables * bits, dim)
    val codes = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var code = 0L
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dim
        var dot = 0.0
        var d = 0
        while (d < dim) {
          dot += x.getFloat(d).toDouble * signs(base + d)
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

  /** Whole-stage-codegen body: the same multiply-accumulate loop with
    * the sign table fetched once per (generated-class, dim) via mutable
    * state — zero hash calls on the per-row path.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val signs = ctx.addMutableState("double[]", "srpSigns", v => s"$v = null;")
      val signsDim = ctx.addMutableState("int", "srpSignsDim", v => s"$v = -1;")
      val dim = ctx.freshName("dim")
      val codes = ctx.freshName("codes")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val code = ctx.freshName("code")
      val base = ctx.freshName("base")
      val dot = ctx.freshName("dot")
      s"""int $dim = $c.numElements();
         |if ($signsDim != $dim) {
         |  $signs = graft.functions.SrpCodes$$.MODULE$$.signTable(${tables * bits}, $dim);
         |  $signsDim = $dim;
         |}
         |long[] $codes = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $code = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    int $base = ($t * $bits + $j) * $dim;
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $dot += ((double) $c.getFloat($d)) * $signs[$base + $d];
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

  /** Per-JVM cache of the ±1 hyperplane matrix, flattened as
    * signs(plane * dim + d). Bit-identical to the original per-row
    * derivation: +1 iff xxHash64((plane << 32) | d, seed 42) is odd.
    * Size is planes × dim doubles (96 × 64 ≈ 48 KB at the 16-table ×
    * 6-bit defaults) — shared across all tasks of the executor.
    */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  def signTable(planes: Int, dim: Int): Array[Double] =
    signCache.computeIfAbsent((planes, dim), { key =>
      val (p, dm) = key
      val a = new Array[Double](p * dm)
      var plane = 0
      while (plane < p) {
        var d = 0
        while (d < dm) {
          a(plane * dm + d) =
            if ((XXH64.hashLong((plane.toLong << 32) | d, 42L) & 1L) == 1L) 1.0 else -1.0
          d += 1
        }
        plane += 1
      }
      a
    })
}
