package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `size(array_intersect(a, b))` for two SORTED string arrays, as one
  * linear merge — the verify-stage hot path of the similarity joins
  * (q120: millions of candidate pairs x ~100-element shingle arrays).
  *
  * Built-in `array_intersect` builds a per-row hash set of UTF8Strings
  * (allocation + hashing per element) and materializes the intersection
  * array only for `size` to throw it away. A two-pointer merge over
  * pre-sorted inputs (`array_sort` once per DOC, amortized over every
  * pair the doc appears in) does zero allocation and compares binary
  * UTF8 directly. Exact — no interning, no hash-collision asterisk on
  * the lossless-verification claim.
  *
  * Caller contract: both arrays sorted ascending (UTF8String binary
  * order == array_sort's ordering), null-free, duplicate-free (shingle
  * SETS). On duplicate elements the merge counts min(multiplicity)
  * — still the multiset-intersect size, but q120 only feeds sets.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft SortedIntersectCount expects two array<string>, got $other")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      val cmp = x.compareTo(y)
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.column(SortedIntersectCount(
      org.apache.spark.sql.graft.bridge.expression(a),
      org.apache.spark.sql.graft.bridge.expression(b)))
}
