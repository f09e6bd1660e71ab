package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Streaming ordered-pair generator over a sorted posting list of
  * BIGINT ids: emits every (ds[i], ds[j]) with i < j as rows (a, b).
  *
  * Replaces the SQL shape `explode(flatten(transform(sequence(...),
  * i -> transform(sequence(...), j -> struct(...)))))`, which
  * MATERIALIZES the full nested pair array per bucket before the
  * explode — O(|bucket|^2) structs allocated at once (a hot LSH bucket
  * of 10k docs would build a 50M-element array in one task's lap). A
  * Generator streams pairs one at a time: same output, flat memory.
  * Interpreted-generator execution (CodegenFallback) is fine — the
  * per-pair work is two long reads.
  */
case class PostingPairs(child: Expression)
    extends Generator with CodegenFallback {

  // Fail at analysis, not mid-task: the generator reads ids via
  // toLongArray, which would silently turn null elements into 0L.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft PostingPairs expects array<bigint> without nulls, got $other")
    }

  override def children: Seq[Expression] = Seq(child)

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val ids = arr.toLongArray()
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      def hasNext: Boolean = i < n - 1
      def next(): InternalRow = {
        val r = new GenericInternalRow(Array[Any](ids(i), ids(j)))
        j += 1
        if (j >= n) { i += 1; j = i + 1 }
        r
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PostingPairs =
    copy(child = newChildren.head)
}

object PostingPairs {
  /** Column-API entry point: select(PostingPairs(col)) yields columns
    * (a, b) through the analyzer's Generate wrapping. */
  def apply(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(PostingPairs(
      org.apache.spark.sql.graft.bridge.expression(c)))
}
