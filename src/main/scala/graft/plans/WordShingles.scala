package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingler: splits on single spaces (exactly the
  * `split(text, ' ')` convention, trailing empties kept) and returns the
  * document's k-word shingles in one pass — either all of them in order
  * or first-occurrence-distinct.
  *
  * Replaces the SQL shape `transform(sequence(0, size(ws)-k), i ->
  * concat(ws[i], ' ', ..., ws[i+k-1]))` (+ `array_distinct`): those are
  * interpreted higher-order lambdas re-concatenating overlapping words
  * per position. One pass over the token array with a reused builder is
  * the same output for a fraction of the per-row cost — the text-dedup
  * family's scans are the 100 TB hot path. Same playbook as
  * [[DotProduct]]/[[RollingHash]]: a compact scalar node, bit-identical
  * output, codegen via a single static call.
  */
case class WordShingles(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {

  require(k >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("wordShingles", WordShingles,
      "graft.plans.WordShingles$")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $obj.compute($c, $k, $distinct);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int, distinct: Boolean): GenericArrayData = {
    // split on single space, limit -1: trailing empty tokens kept,
    // consecutive spaces yield empty tokens — the split(text,' ') rule
    val words = s.toString.split(" ", -1)
    val n = words.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](n)
    val seen = if (distinct) new java.util.HashSet[String](n * 2) else null
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val sh = sb.toString
      if (!distinct || seen.add(sh)) out.add(UTF8String.fromString(sh))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point. */
  def apply(c: Column, k: Int, distinct: Boolean): Column =
    org.apache.spark.sql.graft.bridge.column(WordShingles(
      org.apache.spark.sql.graft.bridge.expression(c), k, distinct))
}
