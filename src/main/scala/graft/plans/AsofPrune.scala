package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Pruning/pushdown through the native ASOF node — the library's fourth
  * optimizer `Rule[LogicalPlan]`, and the one that makes [[AsofJoinPlan]]
  * a first-class citizen of Catalyst's scan optimization instead of a
  * barrier. Every custom logical node is opaque to the built-in
  * ColumnPruning and PushDownPredicates rules, so without this rule a
  * query that filters and narrows the result of a native ASOF join reads
  * EVERY column of both inputs and scans EVERY left row — at 100 TB the
  * difference between a two-column pruned parquet scan with pushed
  * predicates and a full-width full-table read. The built-ins stop at
  * the node; this rule carries their work through it:
  *
  *  - `Filter` above the node: deterministic conjuncts that reference
  *    only LEFT-side output move below into the left child. Sound
  *    because the node is a left-preserving 1:1 map — each left row
  *    produces exactly one output row whose left columns are unchanged,
  *    and each row's match depends only on the RIGHT side (dropping
  *    other left rows never changes it). Conjuncts touching payload
  *    columns stay above (a payload predicate observes the match, which
  *    does not exist before the join); non-deterministic conjuncts stay
  *    above (fewer/reordered evaluations would change their meaning).
  *  - `Project` above the node: left child pruned to the referenced
  *    left columns plus the join key/ts, right child pruned to the
  *    referenced payload columns plus ITS key/ts, and the node's
  *    payload list shrinks to match. Attributes keep their exprIds (the
  *    inserted child Projects select bare attributes), so the parent
  *    resolves untouched.
  *
  * Both rewrites bottom out at the parquet scan: physical planning's
  * `PhysicalOperation` collapses the inserted Project/Filter chains
  * into the relation, so `ReadSchema` narrows and `PushedFilters`
  * populate exactly as they would under a built-in join. Fires only on
  * plans containing an [[AsofJoinPlan]]; terminates because each
  * rewrite strictly shrinks a child's output or moves a conjunct that
  * then no longer matches.
  *
  * Installed alongside [[AsofStrategy]] by [[AsofJoin.join]] and by
  * [[GraftExtensions]].
  */
object AsofPrune extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // ---- filter pushdown: left-only deterministic conjuncts sink ----
    case Filter(cond, a: AsofJoinPlan) =>
      val (push, keep) = splitConjuncts(cond).partition(c =>
        c.deterministic && c.references.subsetOf(a.left.outputSet))
      if (push.isEmpty) Filter(cond, a)
      else {
        val pushed = a.copy(left = Filter(push.reduce(And2), a.left))
        keep.reduceOption(And2).map(Filter(_, pushed)).getOrElse(pushed)
      }

    // ---- column pruning: narrow both children to what is used ----
    case Project(ps, a: AsofJoinPlan) =>
      val refs = AttributeSet(ps.flatMap(_.references))
      val joinRefsL = a.leftKey.references ++ a.leftTs.references
      val joinRefsR = a.rightKey.references ++ a.rightTs.references
      // output payload attrs are withNullability(true) copies sharing
      // exprIds with a.payload, so membership tests line up
      val keepPayload = a.payload.filter(refs.contains)
      val needL = a.left.output.filter(at =>
        refs.contains(at) || joinRefsL.contains(at))
      val needR = a.right.output.filter(at =>
        keepPayload.contains(at) || joinRefsR.contains(at))
      if (needL.length == a.left.output.length &&
          needR.length == a.right.output.length) Project(ps, a)
      else Project(ps, a.copy(
        left = if (needL.length == a.left.output.length) a.left
               else Project(needL, a.left),
        right = if (needR.length == a.right.output.length) a.right
                else Project(needR, a.right),
        payload = keepPayload))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def And2(l: Expression, r: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.And(l, r)
}
