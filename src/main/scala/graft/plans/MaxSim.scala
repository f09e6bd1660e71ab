package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native late-interaction (MaxSim) score over two flat vectors read as
  * `m` equal subvectors: `Σ_i max_j dot(a_i, b_j)` — the ColBERT
  * scoring rule with subvectors standing in for token embeddings
  * (Khattab & Zaharia '20; the q146 PQ subspace convention reused as
  * the multi-vector layout). Accumulation over `i` is left-to-right and
  * each dot is the [[DotProduct]] fold, so the whole score is
  * bit-identical to the oracle's `(g_1 + ... + g_m)` chain of
  * `greatest(...)` terms; `max` over doubles is order-free.
  *
  * Why native: expressed as per-subvector columns this is m² DotProduct
  * nodes per pair (the q198 Catalyst blow-up, squared), and as nested
  * higher-order lambdas it evaluates interpreted (the 50x penalty
  * [[MatVec]] documents). One compact node keeps the m·m·s
  * multiply-adds inside WholeStageCodegen.
  */
case class MaxSim(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {

  require(m > 0, s"graft_maxsim: m must be positive, got $m")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_maxsim"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"graft_maxsim expects array<float|double> inputs, got $other")
  }

  @transient private lazy val leftIsFloat = elemIsFloat(left)
  @transient private lazy val rightIsFloat = elemIsFloat(right)

  // Both sides must hold m equal subvectors; enforced at eval so the
  // error carries the actual lengths (schema-time lengths are unknown).
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    require(nx == ny && nx % m == 0,
      s"graft_maxsim: lengths $nx/$ny not equal multiples of m=$m")
    val s = nx / m
    val lf = leftIsFloat
    val rf = rightIsFloat
    var score = 0.0
    var i = 0
    while (i < m) {
      var best = Double.NegativeInfinity
      var j = 0
      while (j < m) {
        var acc = 0.0
        var d = 0
        while (d < s) {
          val xv = if (lf) x.getFloat(i * s + d).toDouble
            else x.getDouble(i * s + d)
          val yv = if (rf) y.getFloat(j * s + d).toDouble
            else y.getDouble(j * s + d)
          acc += xv * yv
          d += 1
        }
        if (acc > best) best = acc
        j += 1
      }
      score += best
      i += 1
    }
    score
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements() || $a.numElements() % $m != 0) {
         |  throw new IllegalArgumentException(
         |    "graft_maxsim: lengths " + $a.numElements() + "/" +
         |    $b.numElements() + " not equal multiples of m=$m");
         |}
         |int $s = $a.numElements() / $m;
         |double $score = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  double $best = Double.NEGATIVE_INFINITY;
         |  for (int $j = 0; $j < $m; $j++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $s; $d++) {
         |      $acc += (double) $a.$lGet($i * $s + $d)
         |        * (double) $b.$rGet($j * $s + $d);
         |    }
         |    if ($acc > $best) $best = $acc;
         |  }
         |  $score += $best;
         |}
         |${ev.value} = $score;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaxSim =
    copy(left = newLeft, right = newRight)
}

object MaxSim {
  /** Column-API entry point. */
  def apply(a: Column, b: Column, m: Int): Column =
    org.apache.spark.sql.graft.bridge.column(MaxSim(
      org.apache.spark.sql.graft.bridge.expression(a),
      org.apache.spark.sql.graft.bridge.expression(b), m))
}
