package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: per group, keep the k LARGEST input
  * structs under the struct type's natural (lexicographic) ordering and
  * return them as a descending-sorted array.
  *
  * This is the scale path for "top-k per key": a ranking window
  * (`row_number() OVER (PARTITION BY key ORDER BY ...)`)  must shuffle
  * and SORT every row of every group before discarding all but k; this
  * aggregate carries at most k rows per group through the map-side
  * partials and the merge, so the shuffle is O(groups * k) regardless
  * of group size — the difference between feasible and not on a skewed
  * 100 TB key. Encode DESC dimensions by negating (or otherwise
  * inverting) them in the input struct.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0, "k must be positive")

  private lazy val childSchema: StructType =
    child.dataType.asInstanceOf[StructType]

  /** Natural ordering of the input struct; the heap keeps the k largest,
    * so its head (dequeue target) must be the smallest: reverse. */
  private lazy val ord: Ordering[Any] =
    org.apache.spark.sql.graft.bridge.orderingFor(child.dataType)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    new mutable.PriorityQueue[InternalRow]()(
      ord.on[InternalRow](identity).reverse)

  private def offer(pq: mutable.PriorityQueue[InternalRow],
      row: InternalRow): Unit =
    if (pq.size < k) pq.enqueue(row)
    else if (ord.compare(row, pq.head) > 0) { pq.dequeue(); pq.enqueue(row) }

  override def update(pq: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) offer(pq, v.asInstanceOf[InternalRow].copy())
    pq
  }

  override def merge(a: mutable.PriorityQueue[InternalRow],
      b: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(pq: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(
      pq.toArray.sorted(ord.on[InternalRow](identity))
        .reverse.map(_.asInstanceOf[Any]))

  // Built once per aggregate instance, NOT per serialize() call: create
  // compiles a codegen'd projection, and serialize runs once per group.
  @transient private lazy val proj = UnsafeProjection.create(childSchema)

  override def serialize(pq: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val rows = pq.toArray.map(r => proj(r).copy().getBytes)
    val bb = ByteBuffer.allocate(4 + rows.map(_.length + 4).sum)
    bb.putInt(rows.length)
    rows.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val pq = createAggregationBuffer()
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new UnsafeRow(childSchema.length)
      row.pointTo(arr, len)
      pq.enqueue(row)
      i += 1
    }
    pq
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren.head)
}

object TopKAgg {
  /** Column-API entry point: `TopKAgg(struct(...), k)`. */
  def apply(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      TopKAgg(org.apache.spark.sql.graft.bridge.expression(c), k)
        .toAggregateExpression())
}
