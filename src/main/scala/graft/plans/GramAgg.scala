package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact Gram-matrix accumulator: Σ v·vᵀ over a corpus of integer-
  * quantized vectors, as one row-major `array<bigint>` of d² sums.
  *
  * This is the distributed-PCA primitive: the only corpus-sized pass a
  * principal-component computation needs is this aggregate, whose state
  * is a FIXED d² longs per partial (d=64 → 32 KB) merged associatively —
  * the mergeable-summaries shape ([[HeavyHitters]]), except here the
  * "sketch" is lossless. At 100 TB: map-side partials reduce the
  * exchange to (#partitions × d²) longs, the eigen-iteration then runs
  * on the d×d result off the critical path. The explode-and-group
  * alternative pushes d² rows per vector through an aggregate hash map —
  * a 64× per-row blowup this buffer never pays.
  *
  * All arithmetic is `Math.addExact`/`multiplyExact`: at the q43b/q98
  * quantization conventions the products are far inside Long, and if a
  * caller ever feeds un-quantized magnitudes the task fails loudly
  * instead of wrapping (the q88 doctrine). Dimension is pinned by the
  * first vector seen; a ragged corpus fails loudly too.
  */
case class GramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramAgg.Buffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_gram expects array<bigint>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram"

  override def createAggregationBuffer(): GramAgg.Buffer = new GramAgg.Buffer

  override def update(buf: GramAgg.Buffer, input: InternalRow): GramAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      buf.add(arr.toLongArray())
    }
    buf
  }

  override def merge(a: GramAgg.Buffer, b: GramAgg.Buffer): GramAgg.Buffer = {
    a.mergeFrom(b)
    a
  }

  override def eval(buf: GramAgg.Buffer): Any = {
    val g = if (buf.g == null) Array.empty[Long] else buf.g
    new GenericArrayData(g.map(_.asInstanceOf[Any]))
  }

  override def serialize(buf: GramAgg.Buffer): Array[Byte] = {
    val g = if (buf.g == null) Array.empty[Long] else buf.g
    val bb = ByteBuffer.allocate(4 + 4 + 8 * g.length)
    bb.putInt(buf.d)
    bb.putInt(g.length)
    g.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    buf.d = bb.getInt
    val n = bb.getInt
    if (n > 0) {
      buf.g = new Array[Long](n)
      var i = 0
      while (i < n) { buf.g(i) = bb.getLong; i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): GramAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GramAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren.head)
}

object GramAgg {

  /** d² running sums, dimension pinned by the first vector. */
  final class Buffer {
    var d: Int = 0
    var g: Array[Long] = _

    def add(v: Array[Long]): Unit = {
      if (g == null) { d = v.length; g = new Array[Long](d * d) }
      require(v.length == d,
        s"graft_gram: ragged corpus - saw dims $d and ${v.length}")
      var i = 0
      while (i < d) {
        val vi = v(i)
        val row = i * d
        var j = 0
        while (j < d) {
          g(row + j) = Math.addExact(g(row + j), Math.multiplyExact(vi, v(j)))
          j += 1
        }
        i += 1
      }
    }

    def mergeFrom(o: Buffer): Unit = {
      if (o.g == null) return
      if (g == null) { d = o.d; g = o.g.clone() }
      else {
        require(o.d == d,
          s"graft_gram: ragged corpus - saw dims $d and ${o.d}")
        var i = 0
        while (i < g.length) { g(i) = Math.addExact(g(i), o.g(i)); i += 1 }
      }
    }
  }

  /** Column-API entry point. */
  def apply(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(GramAgg(
      org.apache.spark.sql.graft.bridge.expression(c)).toAggregateExpression())

  /** Dominant eigendirection of a row-major d×d Gram matrix by exact
    * integer power iteration: `rounds` of w = G·v with L∞ normalization
    * v' = (w·1e4) div max|w| (BigInt `/` truncates toward zero,
    * bit-equal to DuckDB HUGEINT `//` — the q155 oracle contract),
    * from the all-ones direction. Deterministic; |result| ≤ 1e4.
    * Shared by q155 and the [[graft.streaming.IncrementalGram]] twin so
    * the streamed direction can never drift from the oracle-pinned one. */
  def principal(g: Array[Long], d: Int, rounds: Int): Array[Long] = {
    require(g.length == d * d,
      s"graft_gram principal: length ${g.length}, expected ${d * d}")
    var v = Array.fill(d)(BigInt(10000))
    for (_ <- 1 to rounds) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => BigInt(g(i * d + j)) * v(j)).sum)
      val m = w.map(_.abs).max
      require(m > BigInt(0),
        "graft_gram principal: zero matvec - degenerate corpus")
      v = w.map(x => x * 10000 / m)
    }
    v.map(_.toLong)
  }
}
