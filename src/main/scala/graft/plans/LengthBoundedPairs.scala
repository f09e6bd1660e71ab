package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** [[PostingPairs]] with PPJoin's length filter fused into pair
  * emission (Xiao et al. WWW'08 §3.1): the posting list carries packed
  * `(setSize << 40) | docId` longs sorted ASCENDING — so sizes are
  * non-decreasing along the list, and for each anchor `i` the scan
  * breaks at the first `j` with `size_i < size_j * tau` (every later
  * element is at least as long). Pairs whose Jaccard provably cannot
  * reach tau (J(A,B) <= min/max of the set sizes) are never emitted,
  * never deduplicated, never joined — which removes q120's separate
  * doc-length broadcast joins AND shrinks the pair-distinct exchange.
  * Emits unpacked (a, b) with a < b (the downstream/oracle pair order).
  *
  * The size comparison is the same double multiply the filter form
  * used (`least >= greatest * tau`), so fusing cannot change the
  * candidate set — only where it is pruned. Packing headroom is the
  * caller's contract (PackBits): doc_id < 2^40 (1.1e12 docs — above
  * a 100 TB corpus at any plausible doc size) and set size < 2^23,
  * guarded fail-loud at pack time, never silently truncated here.
  */
case class LengthBoundedPairs(child: Expression, tau: Double)
    extends Generator with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft LengthBoundedPairs expects array<bigint> without nulls, got $other")
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
    val packed = arr.toLongArray()
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      advance()
      private def sz(p: Long): Long = p >>> LengthBoundedPairs.IdBits
      private def id(p: Long): Long = p & LengthBoundedPairs.IdMask
      // position (i, j) at the next surviving pair, breaking the inner
      // scan at the first too-long partner (sizes ascend along the list)
      private def advance(): Unit = {
        while (i < n - 1 &&
            (j >= n || sz(packed(i)).toDouble < sz(packed(j)) * tau)) {
          i += 1; j = i + 1
        }
      }
      def hasNext: Boolean = i < n - 1
      def next(): InternalRow = {
        val x = id(packed(i)); val y = id(packed(j))
        val r = new GenericInternalRow(
          Array[Any](math.min(x, y), math.max(x, y)))
        j += 1
        advance()
        r
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LengthBoundedPairs =
    copy(child = newChildren.head)
}

object LengthBoundedPairs {
  val IdBits = 40
  val IdMask: Long = (1L << IdBits) - 1

  def apply(c: Column, tau: Double): Column =
    org.apache.spark.sql.graft.bridge.column(LengthBoundedPairs(
      org.apache.spark.sql.graft.bridge.expression(c), tau))
}
