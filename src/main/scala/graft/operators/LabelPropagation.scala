package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) — community
  * detection on the near-dup graph, the fourth graph operator next to
  * ConnectedComponents / PageRank / the triangle census. Where CC's
  * min-label fixpoint answers "which docs are transitively connected
  * AT ALL", LPA's frequency rule answers "which docs cluster DENSELY":
  * each round every node adopts the most common label among its
  * neighbors, so a sparse bridge between two dense communities stops
  * propagating where CC would merge everything it touches.
  *
  * Determinism doctrine: classic LPA breaks count ties randomly and
  * updates asynchronously — both unacceptable under a differential
  * oracle. This is the SYNCHRONOUS variant with a total tie order
  * (count DESC, label ASC via `min(struct(-c, lbl))`), run for a FIXED
  * round count — the same map any engine computes exactly, which is
  * what lets a DuckDB unrolled-CTE oracle hash-match it (the q105
  * PageRank doctrine; fixed rounds also sidestep LPA's known
  * oscillation on bipartite structures).
  *
  * Scale shape (the CC/PageRank contract): the symmetrized edge list is
  * persisted ONCE pre-partitioned by the join side, so every round
  * re-shuffles only the node-sized label frame; each round is one
  * edge-label join + two key-bounded aggregates ((node, label) counts,
  * then per-node argmax — both with map-side partials); lineage is cut
  * per round (localCheckpoint) so plans don't grow with rounds.
  */
object LabelPropagation {

  /** pairs: two-column DataFrame of undirected edges. Returns
    * (node, community) for every node appearing in an edge, after
    * `rounds` synchronous updates from self-labels. */
  def run(pairs: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val u = pairs.columns(0)
    val v = pairs.columns(1)
    val sym0 = pairs.select(col(u).as("src"), col(v).as("dst"))
      .union(pairs.select(col(v).as("src"), col(u).as("dst")))
      .distinct()
      .localCheckpoint()
    val n = sym0.count()
    val parts = math.max(1, math.min(
      pairs.sparkSession.sparkContext.defaultParallelism,
      (n / 1000000L).toInt + 1))
    // persist, NOT localCheckpoint: a checkpoint's LogicalRDD drops
    // outputPartitioning under AQE (PartitioningReuseSpec pins this),
    // while the InMemoryRelation keeps the round joins exchange-free
    // on the edge side.
    val sym = sym0.repartition(parts, col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = sym.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("lbl"))
        .coalesce(parts).localCheckpoint()
      for (_ <- 1 to rounds) {
        labels = sym.join(labels, sym("dst") === labels("node"))
          .groupBy(col("src"), col("lbl"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("src"))
          // argmax by (count DESC, label ASC): the deterministic tie
          // order the oracle's row_number(ORDER BY c DESC, lbl) states
          .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l")))
            .as("m"))
          .select(col("src").as("node"), col("m.l").as("lbl"))
          .coalesce(parts).localCheckpoint()
      }
      labels.select(col("node"), col("lbl").as("community"))
    } finally sym.unpersist(blocking = false)
  }
}
