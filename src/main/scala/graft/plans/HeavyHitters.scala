package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary: a fixed-size (`capacity` counters)
  * mergeable sketch over a string column, returning the total input count
  * and the surviving candidate keys.
  *
  * Guarantee (the classic MG bound, preserved under the mergeable-summary
  * merge rule of Agarwal et al., "Mergeable Summaries", PODS'12): after
  * any sequence of updates and merges over N non-null inputs, every key
  * with true count > N/(capacity+1) is present among the candidates. The
  * candidate SET beyond that guarantee depends on partitioning/merge
  * order — so this sketch is the FIRST stage of an exact pipeline, not an
  * answer: confirm candidates with an exact count pass (broadcast the
  * ≤ capacity candidates, semi-join inside the scan, aggregate only
  * matching keys) and threshold at ≥ N/(capacity+1). The confirmed output
  * is then exactly "keys with count ≥ threshold" — deterministic and
  * oracle-checkable — while the vocabulary-sized shuffle of a full
  * group-count never happens: both passes shuffle at most
  * `capacity` keys of map-side partials, the difference between a
  * bounded exchange and a 10M-token vocab exchange at 100 TB.
  *
  * State is `capacity` (key, count) pairs per partial regardless of input
  * size; the decrement step is O(capacity) amortized per eviction.
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHitters.Buffer] {

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  // Fail at analysis, not mid-task: update() reads the child as
  // UTF8String; a non-string child would otherwise ClassCastException
  // on an executor (the PostingPairs/PrefixSum fail-loud doctrine).
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_heavy_hitters expects a STRING column, got " +
            other.simpleString)
    }
  /** `lb` holds the surviving MG counters parallel to `cand` — each is a
    * LOWER bound on its key's true count (true ≤ counter + N/capacity);
    * diagnostics and the streaming twin's summary merge both need them. */
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("cand", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("lb", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): HeavyHitters.Buffer =
    new HeavyHitters.Buffer(capacity)

  override def update(buf: HeavyHitters.Buffer,
      input: InternalRow): HeavyHitters.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(a: HeavyHitters.Buffer,
      b: HeavyHitters.Buffer): HeavyHitters.Buffer = {
    a.mergeFrom(b)
    a
  }

  override def eval(buf: HeavyHitters.Buffer): Any = {
    // binary UTF8String order = Spark's string sort order; stable output
    val keys = buf.counts.keysIterator.toArray
    java.util.Arrays.sort(keys, (x: UTF8String, y: UTF8String) => x.compareTo(y))
    new GenericInternalRow(Array[Any](buf.total,
      new GenericArrayData(keys.map(_.asInstanceOf[Any])),
      new GenericArrayData(keys.map(k => buf.counts(k)))))
  }

  override def serialize(buf: HeavyHitters.Buffer): Array[Byte] = {
    val entries = buf.counts.toArray
    val bb = ByteBuffer.allocate(
      8 + 4 + entries.map(e => 4 + e._1.numBytes() + 8).sum)
    bb.putLong(buf.total)
    bb.putInt(entries.length)
    entries.foreach { case (k, c) =>
      val bytes = k.getBytes
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): HeavyHitters.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    buf.total = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.counts.update(UTF8String.fromBytes(arr), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHitters =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)
}

object HeavyHitters {

  /** MG counter state: at most `capacity` (key, count) pairs + the total
    * processed count (so one pass yields both the candidates and the N
    * that thresholds are computed against). */
  final class Buffer(val capacity: Int) {
    var total: Long = 0L
    val counts: mutable.HashMap[UTF8String, Long] = mutable.HashMap.empty

    def add(k: UTF8String): Unit = {
      total += 1
      counts.get(k) match {
        case Some(c) => counts.update(k, c + 1)
        // stored keys must own their bytes: update()'s input UTF8String
        // points into a reused UnsafeRow buffer (the TopKAgg copy rule)
        case None if counts.size < capacity => counts.update(k.clone(), 1L)
        case None => subtractAndPrune(1L)
      }
    }

    def mergeFrom(o: Buffer): Unit = {
      total += o.total
      // o's keys own their bytes (cloned on insert / fresh on deserialize)
      o.counts.foreach { case (k, c) =>
        counts.update(k, counts.getOrElse(k, 0L) + c)
      }
      if (counts.size > capacity) {
        // the mergeable-MG rule: subtract the (capacity+1)-th largest
        // count from all, drop non-positive — at most `capacity` keys
        // can exceed the cut, and the N/(capacity+1) bound still holds
        val vs = counts.values.toArray
        java.util.Arrays.sort(vs)
        subtractAndPrune(vs(vs.length - capacity - 1))
      }
    }

    private def subtractAndPrune(by: Long): Unit = {
      counts.mapValuesInPlace((_, c) => c - by)
      counts.filterInPlace((_, c) => c > 0)
    }
  }

  /** Column-API entry point: `HeavyHitters(col, capacity)` returns a
    * struct(total: long, cand: array&lt;string&gt;). */
  def apply(c: Column, capacity: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      HeavyHitters(org.apache.spark.sql.graft.bridge.expression(c), capacity)
        .toAggregateExpression())
}
