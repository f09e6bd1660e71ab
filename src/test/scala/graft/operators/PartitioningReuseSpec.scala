package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the planner contract PageRank and ConnectedComponents lean on:
  * a frame persisted WITH a hash-repartition in its plan reports that
  * partitioning downstream (InMemoryTableScan), so an equi-join on the
  * partitioning key exchanges only the OTHER side and an aggregate on it
  * exchanges nothing. Also pins the NEGATIVE that forced persist over
  * checkpoint for the static edge frames: under AQE a localCheckpoint's
  * LogicalRDD drops outputPartitioning, so both join sides re-exchange.
  * If a Spark upgrade changes either behavior, the iteration-loop
  * shuffle accounting in those operators should be revisited — this spec
  * makes the change loud. */
class PartitioningReuseSpec extends SparkSpec {

  /** Shuffles this plan would RUN: descends into AQE's current plan,
    * skips the build plan stored inside cached relations (it is not
    * re-executed on scan). */
  private def shuffleCount(p: SparkPlan): Int = p match {
    case a: AdaptiveSparkPlanExec => shuffleCount(a.executedPlan)
    case _: InMemoryTableScanExec => 0
    case s: ShuffleExchangeExec => 1 + s.children.map(shuffleCount).sum
    case o => o.children.map(shuffleCount).sum
  }
  private def shuffleCount(df: DataFrame): Int =
    shuffleCount(df.queryExecution.executedPlan)

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def edgeFrame: DataFrame = spark.range(200)
    .select((col("id") % 40).as("src"), (col("id") % 7).as("dst"))
  private def labelFrame: DataFrame = spark.range(40)
    .select(col("id").as("node"), (col("id") * 2).as("label"))

  test("join against a pre-partitioned persisted frame shuffles one side") {
    withNoBroadcast {
      val e = edgeFrame.repartition(4, col("src")).persist()
      try {
        e.count() // materialize the cache
        val l = labelFrame
        val joined = e.join(l, e("src") === l("node"))
        assert(shuffleCount(joined) == 1,
          s"expected 1 exchange (labels side only), plan:\n" +
            joined.queryExecution.executedPlan)
        // and the aggregate on the partitioning key adds NO exchange
        val agg = e.groupBy(col("src")).agg(count(lit(1)).as("n"))
        assert(shuffleCount(agg) == 0,
          s"expected 0 exchanges for co-partitioned agg, plan:\n" +
            agg.queryExecution.executedPlan)
      } finally e.unpersist(blocking = false)
    }
  }

  test("localCheckpoint DROPS partitioning under AQE (why CC persists)") {
    withNoBroadcast {
      val e = edgeFrame.repartition(4, col("src")).localCheckpoint()
      val l = labelFrame
      val joined = e.join(l, e("src") === l("node"))
      // both sides re-exchange: the checkpoint's LogicalRDD reports no
      // outputPartitioning. If this starts returning 1, Spark learned to
      // preserve it — the static frames in CC/PageRank could then
      // checkpoint instead of persist.
      assert(shuffleCount(joined) == 2,
        s"localCheckpoint partitioning behavior changed, plan:\n" +
          joined.queryExecution.executedPlan)
    }
  }
}
