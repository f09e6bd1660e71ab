package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer for graft's native expressions — the
  * supported injection point for sessions created with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. Sessions the
  * library does not construct can use `DotProduct.register(spark)`
  * instead (temp-function registration). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // materialized-rollup routing (no-op until a summary is registered)
    ext.injectOptimizerRule(_ => SummaryRewrite)
    // PK-FK join elimination (no-op until an edge is declared)
    ext.injectOptimizerRule(_ => JoinElim)
    // distinct elimination (no-op until a unique key is declared)
    ext.injectOptimizerRule(_ => DistinctElim)
    // native ASOF join planning (no-op unless an AsofJoinPlan is present)
    ext.injectPlannerStrategy(_ => AsofStrategy)
    // pruning/pushdown through the ASOF node (same no-op condition)
    ext.injectOptimizerRule(_ => AsofPrune)
    // native interval-overlap join planning
    ext.injectPlannerStrategy(_ => OverlapStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_matvec"),
      new ExpressionInfo(classOf[MatVec].getName, "graft_matvec"),
      (args: Seq[Expression]) => MatVec(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_maxsim"),
      new ExpressionInfo(classOf[MaxSim].getName, "graft_maxsim"),
      (args: Seq[Expression]) => MaxSim(args(0), args(1),
        foldInt(args(2), "graft_maxsim m"))))
    ext.injectFunction((
      FunctionIdentifier("graft_rollhash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rollhash"),
      (args: Seq[Expression]) => RollingHash(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (args: Seq[Expression]) => WordShingles(args(0),
        foldInt(args(1), "graft_shingles k"),
        foldBool(args(2), "graft_shingles distinct"))))
    ext.injectFunction((
      FunctionIdentifier("graft_repstats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "graft_repstats"),
      (args: Seq[Expression]) => RepetitionStats(args(0),
        foldInt(args(1), "graft_repstats k"))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinHashSig(args(0),
        foldInt(args(1), "graft_minhash k"))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHashAgg(args(0)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
      (args: Seq[Expression]) => TopKAgg(args(0),
        foldInt(args(1), "graft_topk k")).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_gram"),
      new ExpressionInfo(classOf[GramAgg].getName, "graft_gram"),
      (args: Seq[Expression]) => GramAgg(args(0)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHitters].getName, "graft_heavy_hitters"),
      (args: Seq[Expression]) => HeavyHitters(args(0),
        foldInt(args(1), "graft_heavy_hitters capacity"))
        .toAggregateExpression()))
  }

  private def foldInt(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def foldBool(e: Expression, what: String): Boolean = e.eval() match {
    case b: Boolean => b
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }
}
