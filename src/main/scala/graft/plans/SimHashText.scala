package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-ROW 64-bit SimHash of a whitespace-tokenized text — the scalar
  * twin of [[SimHashAgg]] for inputs that arrive one document per row
  * (streaming twins can't run a per-doc aggregate before their keyed
  * stateful stage without an extra shuffled agg in the micro-batch).
  * Tokenization is `split(text, " ")` with trailing empties kept —
  * exactly the `explode(split(text, " "))` feed the batch aggregate
  * sees — and the per-token voting loop is SimHashAgg's own (bit k =
  * bit (k%4) of md5 hex nibble (k div 4), +-1 votes, majority > 0), so
  * `SimHashText(text)` equals `SimHashAgg` over the doc's exploded
  * tokens byte-for-byte (IncrementalSimhashBlocksSpec pins the parity
  * over real corpora). */
case class SimHashText(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash_text"

  // string input enforced here, not via ExpectsInputTypes (whose types
  // are private[sql]) — the DotProduct convention
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_simhash_text expects a string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val buf = new Array[Int](64)
    val digest = Digests.md5()
    var i = 0
    while (i < toks.length) {
      val d = digest.digest(toks(i).getBytes("UTF-8"))
      var k = 0
      while (k < 64) {
        val p = k >> 2 // hex-nibble index 0..15
        val b = d(p >> 1)
        val nib = if ((p & 1) == 0) (b >> 4) & 0xf else b & 0xf
        buf(k) += 2 * ((nib >> (k & 3)) & 1) - 1
        k += 1
      }
      i += 1
    }
    val out = new Array[Char](64)
    var k = 0
    while (k < 64) { out(k) = if (buf(k) > 0) '1' else '0'; k += 1 }
    UTF8String.fromString(new String(out))
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHashText = copy(child = newChild)
}

object SimHashText {
  def apply(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(SimHashText(
      org.apache.spark.sql.graft.bridge.expression(c)))
}
