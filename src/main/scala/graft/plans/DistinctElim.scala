package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Complete, First}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Distinct elimination under a DECLARED unique key — the library's third
  * optimizer `Rule[LogicalPlan]`, closing the warehouse-constraint trio:
  * [[SummaryRewrite]] exploits declared column summaries, [[JoinElim]]
  * declared referential integrity, and this rule declared UNIQUENESS.
  * Spark tracks no uniqueness metadata, so `df.distinct()` or
  * `dropDuplicates("pk")` over a table whose key is already unique pays a
  * full corpus-wide hash aggregate — at 100 TB, the single largest
  * pointless shuffle a pipeline can run (every row crosses the exchange
  * to deduplicate a set with no duplicates).
  *
  * By the time extension rules run, both forms are one `Aggregate`:
  * `.distinct()` arrives as Aggregate(out, out, child) and
  * `.dropDuplicates(keys)` as Aggregate(keys, keys ++ first(others),
  * child). The rule rewrites either to a Project exactly when:
  *
  *  - every grouping expression is a bare attribute, and every
  *    aggregate output is either one of those attributes or
  *    `first(attr)` / `any_value(attr)` over a bare attribute (the
  *    shape ReplaceDeduplicateWithAggregate emits — under uniqueness
  *    each group IS one row, so first() is the identity);
  *  - the aggregate's child reaches a declared scan through Projects
  *    and Filters only ([[JoinElim.sideWalk]] — filters only shrink a
  *    duplicate-free set; a join below could manufacture duplicates,
  *    and anything unrecognized declines);
  *  - SOME grouping attribute maps to the declared unique column: a
  *    tuple containing a key that never repeats never repeats itself.
  *
  * The declaration (`(path, column)` unique) is the caller's audited
  * assertion — `count(*) = count(DISTINCT col)`, the q52-profile
  * check — the same RELY-constraint contract JoinElim documents.
  *
  * Replacement preserves exprIds exactly: grouping outputs are the
  * child's own attributes, and each `first(attr) AS name` becomes
  * `attr AS name` under the ORIGINAL alias exprId, so parents resolve
  * untouched (the SummaryRewrite move).
  */
object DistinctElim extends Rule[LogicalPlan] {

  private final case class Key(path: String, column: String)

  private val keys = ConcurrentHashMap.newKeySet[Key]()

  /** Declare `path.column` unique (the caller's audited assertion). */
  def declare(spark: SparkSession, path: String, column: String): Unit = {
    keys.add(Key(SummaryRewrite.normalize(path), column))
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  /** Drop every declaration (the rule stays installed as a no-op). */
  def clear(): Unit = keys.clear()

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (keys.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => eliminate(agg).getOrElse(agg)
    }

  private def eliminate(agg: Aggregate): Option[LogicalPlan] = {
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => Some(a)
      case _ => None
    }
    if (groupAttrs.exists(_.isEmpty) || groupAttrs.isEmpty) return None
    val groupIds = groupAttrs.flatten.map(_.exprId).toSet
    // every output: a grouping attr, or first()/any_value() of an attr
    val rewritten: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a: AttributeReference if groupIds.contains(a.exprId) => Some(a)
      case al @ Alias(a: AttributeReference, name)
          if groupIds.contains(a.exprId) =>
        Some(Alias(a, name)(exprId = al.exprId))
      case al @ Alias(AggregateExpression(
          First(a: AttributeReference, false), Complete, false, None, _),
          name) =>
        Some(Alias(a, name)(exprId = al.exprId))
      case _ => None
    }
    if (rewritten.exists(_.isEmpty)) return None
    for {
      (path, idMap, _) <- JoinElim.sideWalk(agg.child)
      _ <- Option.when(groupAttrs.flatten.exists(a =>
        idMap.get(a.exprId.id)
          .exists(c => keys.contains(Key(path, c)))))(())
    } yield Project(rewritten.flatten, agg.child)
  }
}
