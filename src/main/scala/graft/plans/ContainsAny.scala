package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-pattern substring counter: how many DISTINCT patterns
  * from a fixed list occur in `text`, via one Aho–Corasick pass
  * (Aho & Corasick '75) over the document. The blocklist/flag-phrase
  * primitive of a corpus-curation pipeline: with P patterns the naive
  * `contains(text, p1) + contains(text, p2) + …` plan re-scans every
  * document P times — at a 10k-phrase blocklist over 100 TB that is
  * 10,000 corpus passes — while the automaton pays O(|text|) per
  * document REGARDLESS of P (the per-char work is one goto/fail walk).
  *
  * The pattern list must be FOLDABLE (a literal — blocklists are
  * configuration, not data): the automaton is built once at plan time
  * and ships to executors as a codegen reference object; the generated
  * code is a single static kernel call (the NearestCentroid lesson —
  * inline multi-statement blocks get split across helper methods by the
  * non-WSCG generators and Janino dangles). Matching is exact
  * case-sensitive substring semantics — identical to `contains` per
  * pattern, which is what keeps the DuckDB oracle a plain CASE sum.
  */
case class ContainsAny(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_contains_any"

  private def checkTypes(): Unit = {
    require(left.dataType == StringType,
      s"graft_contains_any expects a string text column, got ${left.dataType}")
    right.dataType match {
      case ArrayType(StringType, _) => ()
      case other => throw new IllegalArgumentException(
        s"graft_contains_any expects array<string> patterns, got $other")
    }
    require(right.foldable,
      "graft_contains_any: the pattern list must be a literal " +
        "(blocklists are configuration; a per-row pattern column would " +
        "rebuild the automaton per row)")
  }

  @transient private lazy val automaton: ContainsAny.Ac = {
    checkTypes()
    val v = right.eval(null)
    require(v != null, "graft_contains_any: null pattern literal")
    val arr = v.asInstanceOf[ArrayData]
    val pats = (0 until arr.numElements())
      .map(i => arr.getUTF8String(i).toString).toArray
    require(pats.nonEmpty && pats.forall(_.nonEmpty),
      "graft_contains_any: patterns must be non-empty strings")
    new ContainsAny.Ac(pats)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    automaton.countDistinct(a.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[ContainsAny.Ac].getName)
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = $acRef.countDistinct($a.toString());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ContainsAny =
    copy(left = newLeft, right = newRight)
}

object ContainsAny {
  /** Column-API entry point. */
  def apply(text: Column, patterns: Seq[String]): Column =
    org.apache.spark.sql.graft.bridge.column(ContainsAny(
      org.apache.spark.sql.graft.bridge.expression(text),
      org.apache.spark.sql.graft.bridge.expression(
        org.apache.spark.sql.functions.typedlit(patterns))))

  /** Fail-loud ceiling on from-frame pattern collection (distinct
    * patterns). Overridable per session via `graft.containsAny
    * .maxPatterns`. 250k patterns ≈ 25 MB of plan-time strings +
    * a same-order automaton — comfortably broadcastable; a blocklist
    * past it should go through the distributed gram join (q63) instead
    * of a plan-time automaton. */
  private[graft] val MaxPatternsKey = "graft.containsAny.maxPatterns"
  private val MaxPatternsDefault = 250000L

  /** Build the scan from a PATTERN TABLE instead of a literal — the
    * decontamination shape, where the blocklist is data (q63's
    * test-split grams, an eval-benchmark phrase table) rather than
    * configuration. The distinct patterns are collected at plan-build
    * time under a fail-loud cap (the IncrementalBpe doctrine: a bound
    * that is ENFORCED distributed before anything reaches the driver,
    * never assumed), sorted so the embedded literal — and therefore
    * the plan — is deterministic whatever the frame's partitioning.
    * `patterns` must be a one-column-usable frame of non-empty strings. */
  def fromFrame(text: Column, patterns: org.apache.spark.sql.DataFrame,
      patternCol: String): Column = {
    val s = patterns.sparkSession
    val max = s.conf.get(MaxPatternsKey, MaxPatternsDefault.toString).toLong
    val pats = patterns
      .select(org.apache.spark.sql.functions.col(patternCol).as("p"))
      .distinct().persist()
    try {
      val n = pats.count() // gates BEFORE the collect, distributed
      require(n > 0L && n <= max,
        s"graft_contains_any.fromFrame: $n distinct patterns exceeds the " +
          s"plan-time automaton cap $max (conf $MaxPatternsKey). A " +
          "blocklist this large is corpus-shaped: use the distributed " +
          "gram join (q63_decontaminate) instead of a broadcast automaton.")
      apply(text, pats.orderBy("p").collect().map(_.getString(0)).toSeq)
    } finally pats.unpersist(blocking = false)
  }

  /** Aho–Corasick automaton over UTF-16 chars: goto tries + BFS fail
    * links + dictionary-link output sets. Built once per plan, shipped
    * whole (Serializable) to executors. */
  final class Ac(patterns: Array[String]) extends Serializable {
    private val children =
      scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.HashMap.empty[Char, Int])
    private val fail = scala.collection.mutable.ArrayBuffer(0)
    private val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])

    patterns.zipWithIndex.foreach { case (p, pid) =>
      var v = 0
      p.foreach { ch =>
        v = children(v).getOrElseUpdate(ch, {
          children += scala.collection.mutable.HashMap.empty[Char, Int]
          fail += 0
          out += Nil
          children.size - 1
        })
      }
      out(v) = pid :: out(v)
    }
    // BFS fail links; merge the fail target's output set (dictionary
    // links collapsed eagerly — match sets are tiny here)
    locally {
      val queue = scala.collection.mutable.Queue.empty[Int]
      children(0).valuesIterator.foreach { c => fail(c) = 0; queue += c }
      while (queue.nonEmpty) {
        val v = queue.dequeue()
        children(v).foreach { case (ch, c) =>
          var f = fail(v)
          while (f != 0 && !children(f).contains(ch)) f = fail(f)
          fail(c) = children(f).get(ch).filter(_ != c).getOrElse(0)
          out(c) = out(c) ::: out(fail(c))
          queue += c
        }
      }
    }

    /** Number of DISTINCT patterns occurring in `text`. */
    def countDistinct(text: String): Int = {
      val found = new Array[Boolean](patterns.length)
      var n = 0
      var state = 0
      var i = 0
      while (i < text.length && n < patterns.length) {
        val ch = text.charAt(i)
        while (state != 0 && !children(state).contains(ch))
          state = fail(state)
        state = children(state).getOrElse(ch, 0)
        out(state).foreach { pid =>
          if (!found(pid)) { found(pid) = true; n += 1 }
        }
        i += 1
      }
      n
    }
  }
}
