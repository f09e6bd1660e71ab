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
  * The size comparison is EXACT integer arithmetic on tau's rational
  * decomposition p/q (`size_i * q < size_j * p` via a 128-bit product
  * compare — every finite double is dyadic, so the decomposition loses
  * nothing): a boundary pair sitting exactly at the bound is never
  * FP-pruned at ANY tau, not only at values like 0.5 whose double
  * products happen to stay exact (ADVICE r13). Packing headroom is the
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

  // tau = tauP / tauQ exactly (dyadic decomposition of the double)
  private lazy val tauPQ: (Long, Long) = LengthBoundedPairs.rational(tau)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val packed = arr.toLongArray()
    val (tp, tq) = tauPQ
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      advance()
      private def sz(p: Long): Long = p >>> LengthBoundedPairs.IdBits
      private def id(p: Long): Long = p & LengthBoundedPairs.IdMask
      // position (i, j) at the next surviving pair, breaking the inner
      // scan at the first too-long partner (sizes ascend along the
      // list); size_i < size_j * tau compared exactly as
      // size_i * q < size_j * p
      private def advance(): Unit = {
        while (i < n - 1 &&
            (j >= n || !LengthBoundedPairs.geProd(
              sz(packed(i)), tq, sz(packed(j)), tp))) {
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

  /** tau as the EXACT rational p/q of its double value. Every finite
    * double is dyadic (mantissa * 2^e), so the decomposition is
    * lossless and the pair-generator prunes can run in integer
    * arithmetic: a boundary pair is never FP-pruned at ANY tau, not
    * only at taus whose double products stay exact (ADVICE r13).
    * tau must sit in [2^-10, 1] so the reduced denominator fits a
    * Long — far below any useful similarity threshold. */
  def rational(tau: Double): (Long, Long) = {
    require(tau >= 1.0 / 1024 && tau <= 1.0,
      s"graft pair generators: tau must be in [2^-10, 1], got $tau")
    if (tau == 1.0) return (1L, 1L)
    val bits = java.lang.Double.doubleToLongBits(tau)
    val mant = (bits & ((1L << 52) - 1)) | (1L << 52)
    val e = ((bits >>> 52) & 0x7ff).toInt - 1075 // tau = mant * 2^e, e < 0
    val shift = math.min(java.lang.Long.numberOfTrailingZeros(mant), -e)
    (mant >>> shift, 1L << (-e - shift))
  }

  /** Exact `a*b >= c*d` on nonnegative longs: 128-bit product compare
    * (multiplyHigh is a JIT intrinsic; operands < 2^63, so the signed
    * high word equals the unsigned one and only the low word needs the
    * unsigned comparison). */
  def geProd(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a * b, c * d) >= 0
  }
}
