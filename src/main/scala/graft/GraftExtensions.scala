package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{ArrayDot, Md5MinShingle, Md5SimHash, MinHashSignature, NfcNormalize, SrpCodes}

/** SQL surface for graft's native expressions: register `array_dot`,
  * `minhash_sig`, `srp_codes`, `md5_simhash` and `md5_min_shingle` so
  * pure-SQL users (spark.sql, JDBC, SQL files) get the same codegen'd
  * kernels the DataFrame API uses.
  *
  * Two entry points:
  *  - `--conf spark.sql.extensions=graft.GraftExtensions` at session
  *    build time (the standard extensions hook), or
  *  - `GraftExtensions.register(spark)` on a live session.
  *
  * Size/seed arguments must be integer literals — they are structural
  * parameters of the expression (signature length, table/bit counts),
  * not per-row data.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
    // whole-plan rewrite surface: naive interval joins → bucketized
    // equi-joins, gated behind spark.graft.rangeJoin.bucketWidthUs
    ext.injectOptimizerRule(graft.plans.RewriteRangeJoin)
    // whole-operator surface: TopKPerKey logical node → bounded-heap
    // partial/final physical operator (no-op unless the node is used)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other =>
      throw new IllegalArgumentException(s"$name must be an integer literal, got $other")
  }

  private[graft] val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (args: Seq[Expression]) => ArrayDot(args(0), args(1))),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSignature(args(0), intArg(args(1), "k"))),
    (FunctionIdentifier("srp_codes"),
      new ExpressionInfo(classOf[SrpCodes].getName, "srp_codes"),
      (args: Seq[Expression]) =>
        SrpCodes(args(0), intArg(args(1), "tables"), intArg(args(2), "bitsPerTable"))),
    (FunctionIdentifier("md5_simhash"),
      new ExpressionInfo(classOf[Md5SimHash].getName, "md5_simhash"),
      (args: Seq[Expression]) => Md5SimHash(args(0), intArg(args(1), "bits"))),
    (FunctionIdentifier("md5_min_shingle"),
      new ExpressionInfo(classOf[Md5MinShingle].getName, "md5_min_shingle"),
      (args: Seq[Expression]) => Md5MinShingle(args(0))),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => NfcNormalize(args(0))))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
