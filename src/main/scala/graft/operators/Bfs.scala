package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search — the fifth graph operator next to
  * ConnectedComponents / PageRank / the triangle census / LabelPropagation.
  * Answers the question the others don't: not "connected at all" (CC) or
  * "densely clustered" (LPA) but "HOW FAR is every node from a seed set" —
  * the contamination-radius / blast-radius query a curation pipeline runs
  * when a set of documents is flagged (how much of the near-dup graph sits
  * within k hops of the flagged docs).
  *
  * Determinism: BFS levels are a well-defined map (min hop count), no tie
  * rule needed — a node is reached at round r or it is not; the FIXED round
  * bound makes the DuckDB unrolled-CTE oracle exact (the q105/q129
  * doctrine).
  *
  * Scale shape (the CC/PageRank contract): the symmetrized edge list is
  * persisted ONCE pre-partitioned by the join side, so every round
  * re-shuffles only the frontier (which is at most node-sized and usually
  * far smaller); each round is one edge-frontier join, a distinct, and an
  * anti-join against the visited set — all key-bounded exchanges; lineage
  * is cut per round (localCheckpoint) so plans don't grow with rounds.
  * Per-round cost is |edges touching the frontier|, the textbook frontier
  * contract, so a 100× graph pays 100× per round, not rounds × 100×.
  */
object Bfs {

  /** Symmetrize + pre-partition + persist the edge list ONCE for one or
    * several BFS runs over the same graph (the q258 double sweep runs
    * two; re-preparing per run would shuffle and materialize the edge
    * set twice). Caller owns the returned frame's unpersist. */
  private[graft] def symmetrize(pairs: DataFrame): (DataFrame, Int) = {
    val u = pairs.columns(0)
    val v = pairs.columns(1)
    val sym0 = pairs.select(col(u).as("src"), col(v).as("dst"))
      .union(pairs.select(col(v).as("src"), col(u).as("dst")))
      .distinct()
      // lazy: the sizing count right below is the materializing action,
      // so prepare runs one job, not checkpoint-then-count
      .localCheckpoint(eager = false)
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
    (sym, parts)
  }

  /** pairs: two-column DataFrame of undirected edges; seeds: one-column
    * DataFrame of start nodes (hop 0). Returns (node, hops) for every
    * node within `rounds` hops of any seed — minimum hop distance. */
  def run(pairs: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    val (sym, parts) = symmetrize(pairs)
    try runPrepared(sym, parts, seeds, rounds)
    finally sym.unpersist(blocking = false)
  }

  /** [[run]] over an already-[[symmetrize]]d edge frame — the multi-
    * sweep entry point; does NOT unpersist the edges. */
  private[graft] def runPrepared(sym: DataFrame, parts: Int,
      seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    locally {
      var visited = seeds
        .select(col(seeds.columns(0)).as("node"), lit(0L).as("hops"))
        .distinct()
        .coalesce(parts).localCheckpoint()
      var frontier = visited.select(col("node"))
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        // lazy checkpoint + count (the ConnectedComponents move): the
        // count is the materializing action, so each round runs ONE job
        // instead of eager-checkpoint-then-checkpoint — and its result
        // is the early-exit signal for free. `visited` stays a lazy
        // union of per-round checkpointed frames (≤ rounds children,
        // each lineage-truncated), so the plan never deepens past the
        // round budget while the union itself costs no extra job.
        val next = sym.join(frontier, sym("dst") === frontier("node"))
          .select(col("src").as("node")).distinct()
          .join(visited.select(col("node")), Seq("node"), "left_anti")
          .select(col("node"), lit(r.toLong).as("hops"))
          .coalesce(parts).localCheckpoint(eager = false)
        val n = next.count()
        visited = visited.union(next)
        frontier = next.select(col("node"))
        // an empty frontier is the fixpoint: every later round would
        // produce zero rows, so the hop map is already complete and the
        // remaining rounds would only burn one no-op job each — the
        // RESULT is identical (min-hop levels are a well-defined map)
        exhausted = n == 0
        r += 1
      }
      visited
    }
  }
}
