package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** Generator emitting every ordered pair (ds[i], ds[j]) with i < j from
  * a SORTED long-array posting list — the inverted-index co-occurrence
  * step of exact n-gram Jaccard ([[graft.operators.DedupOps.ngramJaccardPairs]]).
  *
  * Why a custom Generator: the higher-order-function formulation
  * (`flatten(transform(ds, (x,i) -> transform(slice(...), ...)))`)
  * interprets a nested closure tree per ELEMENT — measured ~1 s of pure
  * interpreter overhead at sf0.1 (1.27 M pairs). This iterator emits
  * rows directly: no intermediate array materialization, no per-pair
  * expression tree, d(d−1)/2 rows streamed out of each posting row.
  *
  * Input must be pre-sorted for the da < db output contract (the
  * caller sorts via `sort_array` during posting aggregation).
  */
case class PostingPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("da", LongType, nullable = false),
    StructField("db", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"posting_pairs expects array<long>, got $other")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < 2) Iterator.empty
    else {
      val n = arr.numElements()
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        override def hasNext: Boolean = i < n - 1
        override def next(): InternalRow = {
          val r = InternalRow(arr.getLong(i), arr.getLong(j))
          j += 1
          if (j >= n) { i += 1; j = i + 1 }
          r
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): PostingPairs =
    copy(child = newChild)

  override def prettyName: String = "posting_pairs"
}

object PostingPairs {
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(PostingPairs(ColumnBridge.expression(c)))
  }
}
