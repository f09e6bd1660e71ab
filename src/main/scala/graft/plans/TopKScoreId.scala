package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** [[TopKAgg]] specialized to the (score: double, id: long) shape every
  * ANN/top-k consumer actually aggregates: per group keep the k largest
  * (score, id) pairs lexicographically, returned as a descending-sorted
  * array<struct<score,id>>.
  *
  * TopKAgg's generality is what made it lose to the window form at the
  * few-query 10x regime (33.4 s vs 24.9, BENCH_r06): per input row it
  * interpreted-evals a struct, copies it to a fresh InternalRow, and
  * compares through a boxed generic ordering. This buffer is two
  * primitive arrays managed as a binary min-heap — update is two field
  * evals, primitive compares, and at most one sift; no allocation on
  * the keep-out path (the overwhelmingly common one once the heap
  * fills). Same O(groups * k) shuffle contract as TopKAgg.
  */
case class TopKScoreId(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKScoreId.Buf] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_topk_score_id"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_topk_score_id expects (double, bigint), got $other")
    }

  override def createAggregationBuffer(): TopKScoreId.Buf =
    new TopKScoreId.Buf(k)

  override def update(buf: TopKScoreId.Buf, input: InternalRow): TopKScoreId.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKScoreId.Buf, b: TopKScoreId.Buf): TopKScoreId.Buf = {
    var i = 0
    while (i < b.n) { a.offer(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKScoreId.Buf): Any = {
    // sort the <= k live entries descending by the SAME total order the
    // heap uses (NaN greatest, -0.0 == 0.0) — a Scala tuple sortBy
    // would place NaN last where the window form ranks it first
    val idx = (0 until buf.n).sortWith((a, b) => TopKScoreId.totalLess(
      buf.scores(b), buf.ids(b), buf.scores(a), buf.ids(a)))
    new GenericArrayData(idx.map { i =>
      new GenericInternalRow(
        Array[Any](buf.scores(i), buf.ids(i))): Any
    }.toArray)
  }

  override def serialize(buf: TopKScoreId.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKScoreId.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.offer(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKScoreId =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKScoreId =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKScoreId =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKScoreId {

  /** TOTAL order matching Spark SQL's double ordering: NaN compares as
    * the largest double (IEEE < is false both ways for NaN, which would
    * let a NaN root permanently reject every later heap offer), and
    * -0.0 is normalized to 0.0 by the +0.0 (Spark treats them equal, so
    * the id tie-break must apply across them). Shared by the heap and
    * the eval sort so retention and emission can never disagree. */
  private[plans] def totalLess(s1: Double, i1: Long,
      s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1 + 0.0, s2 + 0.0)
    c < 0 || (c == 0 && i1 < i2)
  }

  /** Binary MIN-heap over (score, id) pairs in two primitive arrays:
    * the root is the smallest kept pair, so a full heap rejects a
    * non-qualifying row with one comparison and zero writes. */
  final class Buf(k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var n: Int = 0

    private def less(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      totalLess(s1, i1, s2, i2)

    def offer(s: Double, i: Long): Unit = {
      if (n < k) {
        // insert at the end, sift up
        var c = n
        scores(c) = s; ids(c) = i; n += 1
        while (c > 0 && less(scores(c), ids(c), scores((c - 1) / 2), ids((c - 1) / 2))) {
          val p = (c - 1) / 2
          swap(c, p); c = p
        }
      } else if (less(scores(0), ids(0), s, i)) {
        // replace the root, sift down
        scores(0) = s; ids(0) = i
        var c = 0
        var done = false
        while (!done) {
          val l = 2 * c + 1; val r = l + 1
          var m = c
          if (l < n && less(scores(l), ids(l), scores(m), ids(m))) m = l
          if (r < n && less(scores(r), ids(r), scores(m), ids(m))) m = r
          if (m == c) done = true
          else { swap(c, m); c = m }
        }
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }
  }

  /** Column-API entry point: `TopKScoreId(scoreCol, idCol, k)`. */
  def apply(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      TopKScoreId(
        org.apache.spark.sql.graft.bridge.expression(score),
        org.apache.spark.sql.graft.bridge.expression(id), k)
        .toAggregateExpression())
}
