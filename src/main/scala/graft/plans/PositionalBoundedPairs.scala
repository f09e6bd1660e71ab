package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** [[LengthBoundedPairs]] with PPJoin's POSITIONAL filter fused in
  * (Xiao et al. WWW'08 §3.2): each posting-list element carries, next
  * to the packed `(setSize << 40) | docId` long, the token's 1-based
  * position within its document's canonical (rarest-first) shingle
  * order. For a pair co-occurring at positions (pa, pb), the shared
  * tokens beyond this one all sit at LATER canonical positions, so the
  * overlap is bounded by `1 + min(na - pa, nb - pb)` — and J(A,B) >=
  * tau requires overlap >= tau/(1+tau) * (na + nb). A co-occurrence
  * whose bound cannot reach that is never emitted.
  *
  * Losslessness (the PPJoin argument): if the pair's TRUE overlap o
  * satisfies J >= tau, take its FIRST shared token in canonical order,
  * at positions (pa*, pb*). Every shared token sits at position >= pa*
  * in A, so o <= 1 + (na - pa*), and symmetrically for B — the bound
  * at THAT co-occurrence is >= o >= the requirement, so the pair
  * survives there whatever happens at its later co-occurrences. The
  * prefix property guarantees the first shared token IS in both
  * prefixes, so the surviving co-occurrence is in the index.
  *
  * The prune compares `ub * (p+q) >= p * (na+nb)` in EXACT integer
  * arithmetic on tau's dyadic decomposition p/q (the overlap
  * requirement `ub*(1+tau) >= tau*(na+nb)` cleared of denominators;
  * 128-bit product compare, [[LengthBoundedPairs.geProd]]), so the
  * boundary pair (overlap exactly at the requirement) is never
  * FP-pruned at ANY tau — not only at 0.5, whose double products
  * happened to stay exact (ADVICE r13). The length filter stays
  * fused and equally exact: elements sort by the packed long, sizes
  * ascend, the inner scan breaks at the first too-long partner.
  * Emits (a, b) with a < b.
  */
case class PositionalBoundedPairs(child: Expression, tau: Double)
    extends Generator with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // nullability is not constrained: the packed pid projects through
      // a raise_error CASE arm (typed nullable, never null), and tuple
      // encoders type their arrays containsNull=true — non-null
      // elements are the caller's contract, like the packing headroom
      case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, IntegerType, _, _))), _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "graft PositionalBoundedPairs expects " +
            s"array<struct<bigint,int>> without nulls, got $other")
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
    val (tp, tq) = tauPQ
    // unpack once into primitive arrays: the generator may emit O(n^2)
    // pairs off this list, so per-pair struct access would dominate
    val packed = new Array[Long](n)
    val pos = new Array[Int](n)
    var k = 0
    while (k < n) {
      val row = arr.getStruct(k, 2)
      packed(k) = row.getLong(0)
      pos(k) = row.getInt(1)
      k += 1
    }
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      advance()
      private def sz(p: Long): Long = p >>> LengthBoundedPairs.IdBits
      private def id(p: Long): Long = p & LengthBoundedPairs.IdMask
      // (i, j) at the next surviving pair: break the inner scan at the
      // first too-long partner (length filter — sizes ascend along the
      // list), and SKIP co-occurrences whose positional bound cannot
      // reach the overlap requirement (skip, not break: the bound is
      // not monotone along the list, later partners may pass)
      private def advance(): Unit = {
        while (i < n - 1) {
          // length filter, exact: size_i < size_j * tau as size_i*q < size_j*p
          if (j >= n || !LengthBoundedPairs.geProd(
              sz(packed(i)), tq, sz(packed(j)), tp)) {
            i += 1; j = i + 1
          } else {
            val na = sz(packed(i)); val nb = sz(packed(j))
            val ub = 1L + math.min(na - pos(i), nb - pos(j))
            // positional bound, exact: ub*(1+tau) >= tau*(na+nb) as
            // ub*(p+q) >= p*(na+nb); p < q <= 2^62 and ub <= 2^23, so
            // the 128-bit compare never overflows
            if (LengthBoundedPairs.geProd(ub, tp + tq, tp, na + nb)) return
            j += 1
          }
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
      newChildren: IndexedSeq[Expression]): PositionalBoundedPairs =
    copy(child = newChildren.head)
}

object PositionalBoundedPairs {
  def apply(c: Column, tau: Double): Column =
    org.apache.spark.sql.graft.bridge.column(PositionalBoundedPairs(
      org.apache.spark.sql.graft.bridge.expression(c), tau))
}
