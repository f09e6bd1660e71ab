package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash aggregate: per group, every input string votes
  * its md5's 64 bits (+1/-1 per bit, bit k = bit (k%4) of hex nibble
  * (k div 4)); the result is the '1'/'0' fingerprint string of the
  * per-bit majority (sum > 0), identical to the portable SQL
  * formulation and its DuckDB oracle (fpSql in graft.queries.Dedup).
  *
  * Why a native aggregate: the SQL shape must expand each token into a
  * 64-element signed-bit array (an interpreted higher-order lambda per
  * row) and then run 64 separate sum() columns. This node does the same
  * arithmetic imperatively — one md5 per input, 64 int adds on a
  * fixed-size buffer — and merges buffers elementwise, so it combines
  * map-side and shuffles 64 ints per group at any scale, like any
  * built-in partial aggregate.
  *
  * Tier (b) of the build brief, aggregate flavor: a
  * TypedImperativeAggregate (the mechanism behind Spark's own
  * collect_list/percentile), not a Scala UDAF — no per-row
  * encoder boxing.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val digest = Digests.md5()
      val bytes = v.asInstanceOf[UTF8String].getBytes
      val d = digest.digest(bytes)
      var k = 0
      while (k < 64) {
        val p = k >> 2 // hex-nibble index 0..15
        val b = d(p >> 1)
        val nib = if ((p & 1) == 0) (b >> 4) & 0xf else b & 0xf
        buf(k) += 2 * ((nib >> (k & 3)) & 1) - 1
        k += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    val sb = new java.lang.StringBuilder(64)
    var k = 0
    while (k < 64) { sb.append(if (buf(k) > 0) '1' else '0'); k += 1 }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    var i = 0
    while (i < 64) { bb.putInt(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Int](64)
    var i = 0
    while (i < 64) { buf(i) = bb.getInt(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Column-API entry point (aggregate function). */
  def apply(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      SimHashAgg(org.apache.spark.sql.graft.bridge.expression(c))
        .toAggregateExpression())
}
