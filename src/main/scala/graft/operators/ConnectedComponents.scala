package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative minimum-label
  * propagation — the clustering step between near-duplicate PAIRS and
  * canonical-document selection in a dedup pipeline (pairs say "a~b";
  * training-set construction needs whole components).
  *
  * Each node starts labeled with itself; every iteration each node
  * takes the min of its own label and its neighbors' labels; fixpoint
  * = components labeled by their minimum member. Convergence needs at
  * most the graph diameter's iterations (near-dup graphs are
  * small-diameter clusters, so a handful); the driver only coordinates
  * — each step is a join + aggregate over the edge set, the same
  * shuffle shape at any scale (this is the Pregel/GraphX CC algorithm
  * expressed relationally). Lineage is truncated per iteration
  * (localCheckpoint) so plans don't grow with the iteration count.
  */
object ConnectedComponents {

  /** edges: two-column DataFrame of undirected pairs (u, v). Returns
    * (node, cluster_id) for every node appearing in an edge, cluster_id
    * = the component's minimum node id. Throws if the propagation has
    * not reached a fixpoint within `maxIter` iterations (label
    * propagation needs ~diameter steps; silently returning would split
    * components with no signal). Superseded per-iteration checkpoints
    * are reclaimed by the context cleaner once their references drop
    * out of scope each loop turn. */
  def run(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val u = edges.columns(0)
    val v = edges.columns(1)
    val sym0 = edges.select(col(u).as("src"), col(v).as("dst"))
      .union(edges.select(col(v).as("src"), col(u).as("dst")))
      .distinct()
      // lazy: the sizing count right below is the materializing action,
      // so symmetrize runs one job, not checkpoint-then-count
      .localCheckpoint(eager = false)
    // Size the loop's parallelism to the graph, not the session default:
    // iterating a 1k-edge candidate graph through 32-way shuffles spends
    // more on task scheduling than on work, while a billion-edge graph
    // gets the full session parallelism (~1M edges per partition).
    val n = sym0.count()
    val parts = math.max(1, math.min(
      edges.sparkSession.sparkContext.defaultParallelism,
      (n / 1000000L).toInt + 1))
    // PERSISTED pre-partitioned by src: every round's propagation join
    // then re-shuffles only the node-sized label frame, never the edge
    // list — one edge shuffle up front instead of one per round, the
    // PageRank contract. persist, NOT localCheckpoint: under AQE a
    // checkpoint's LogicalRDD drops outputPartitioning (both join sides
    // re-exchange — PartitioningReuseSpec pins exactly this), while an
    // InMemoryRelation reports the cached plan's partitioning. The init
    // aggregate right below reads the same partitioning exchange-free.
    val sym = sym0.repartition(parts, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 1-hop initialization: start from min(self, neighbors) instead of
    // self — folds the first propagation into the init aggregate and
    // saves one full iteration (near-dup graphs are mostly cliques, so
    // this alone is often already the fixpoint).
    try {
    var labels = sym.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("nmin"))
      .select(col("node"), least(col("node"), col("nmin")).as("label"))
      .coalesce(parts).localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // each node's new label: min over itself and all neighbors; the
      // previous label rides along so convergence is read off the same
      // materialization instead of a separate join
      val prop = sym.join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("label"),
          lit(null).cast(labels.schema("label").dataType).as("old"))
      val hop = labels.select(col("node"), col("label"),
          col("label").as("old"))
        .union(prop)
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"), min(col("old")).as("old"))
      // pointer jump: label <- label[label]. Labels are node ids, so
      // the lookup is a self-join; min-monotone like the hop, same
      // fixpoint, but it SQUARES the distance covered per iteration —
      // long duplicate chains converge in ~log2(diameter) rounds
      // instead of diameter (cliques were already 1-2 rounds). One
      // extra shuffle per round buys the round count down.
      //
      // `hop` is persisted for the round: the self-join references the
      // aggregate twice, and ColumnPruning rewrites the probe side
      // (drops `old`) so the two subtrees no longer canonicalize and
      // ReuseExchange cannot fire — unpersisted, the graph would be
      // union+aggregated twice per round (an alternative that jumped
      // through the previous round's checkpointed labels kept one pass
      // but compounded reach at only ~1.6x/round — measured ~35% slower
      // to converge at the 10x corpus than caching + true doubling).
      // The cache is partition-locked get-or-compute, so both join
      // sides still drive ONE computation within the round's one job.
      val hopC = hop.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val next = hopC.as("a")
        .join(hopC.select(col("node").as("jn"), col("label").as("jl")),
          col("a.label") === col("jn"), "left")
        .select(col("a.node").as("node"),
          least(col("a.label"), coalesce(col("jl"), col("a.label")))
            .as("label"),
          col("a.old").as("old"))
        // lazy checkpoint: the convergence count right below is the
        // materializing action, so each iteration runs ONE job instead
        // of checkpoint-then-count (halves the per-iteration fixed
        // latency that dominates at test scale)
        .coalesce(parts).localCheckpoint(eager = false)
      val changed =
        try next.filter(col("label") =!= col("old")).count()
        finally hopC.unpersist(blocking = false) // even on a failed count
      labels = next.select(col("node"), col("label"))
      converged = changed == 0
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge within $maxIter iterations " +
        "(graph diameter exceeds the bound); raise maxIter")
    // labels is backed by its own materialized checkpoint (the
    // convergence count was the action), so releasing sym is safe
    labels.select(col("node"), col("label").as("cluster_id"))
    } finally sym.unpersist(blocking = false)
  }
}
