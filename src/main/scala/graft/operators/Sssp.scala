package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted single-source(-set) shortest paths — the seventh graph
  * operator, completing the distance story [[Bfs]] started: BFS answers
  * "how many HOPS from a seed", SSSP answers "how much accumulated COST"
  * when edges carry a real dissimilarity (shingle edit distance, link
  * latency, transition cost). On the near-dup graph this is semantic
  * drift: two docs three weak edges apart may be farther than one strong
  * edge away, and a curation pass that expands a contamination set wants
  * the cheapest-path metric, not the hop count.
  *
  * Algorithm: Bellman-Ford in synchronous rounds. After round r the
  * distance map holds the exact minimum path weight over paths of at
  * most r edges — a well-defined map with no tie rule (min over a finite
  * set), so a FIXED round bound makes the DuckDB unrolled-CTE oracle
  * exact (the q105/q129/q134 fixed-round doctrine). Weights must be
  * non-negative longs; with `rounds >= |V|-1` the result is the true
  * shortest-path distance.
  *
  * Scale shape (the Bfs/CC contract): the symmetrized weighted edge list
  * is persisted ONCE pre-partitioned on the probe side, so each round
  * re-shuffles only the FRONTIER — the rows whose distance improved last
  * round, which shrinks fast as the map converges (on a metric graph
  * most nodes settle in a few rounds). Each round is one edge-frontier
  * join, a min-aggregate keyed by node, and a full-outer merge with the
  * settled map — all key-bounded exchanges, nothing corpus-sized beyond
  * the first wave. Lineage is cut per round (localCheckpoint) so the
  * plan does not grow with rounds.
  */
object Sssp {

  /** edges: (u, v, w) undirected non-negative-weight edges (first three
    * columns, any names); seeds: one-column frame of start nodes
    * (distance 0). Returns (node, dist) — the minimum path weight over
    * paths of at most `rounds` edges, for every node so reachable. */
  def run(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val Array(u, v, w) = edges.columns.take(3)
    val sym0 = edges.select(col(u).as("src"), col(v).as("dst"),
        col(w).cast("long").as("w"))
      .union(edges.select(col(v).as("src"), col(u).as("dst"),
        col(w).cast("long").as("w")))
      .distinct()
      // lazy: the sizing count right below is the materializing action
      .localCheckpoint(eager = false)
    val n = sym0.count()
    val parts = math.max(1, math.min(
      edges.sparkSession.sparkContext.defaultParallelism,
      (n / 1000000L).toInt + 1))
    // persist, NOT localCheckpoint: the InMemoryRelation keeps its
    // outputPartitioning under AQE (PartitioningReuseSpec pins this),
    // so the per-round join is exchange-free on the edge side.
    val sym = sym0.repartition(parts, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var dist = seeds
        .select(col(seeds.columns(0)).as("node"), lit(0L).as("dist"))
        .distinct()
        .coalesce(parts).localCheckpoint()
      var frontier = dist
      var r = 1
      var settled = false
      while (r <= rounds && !settled) {
        // relax every edge leaving a node whose distance just improved
        val cand = sym
          .join(frontier, sym("src") === frontier("node"))
          .select(col("dst").as("node"), (col("dist") + col("w")).as("nd"))
          .groupBy(col("node")).agg(min(col("nd")).as("nd"))
        // lazy checkpoint + count (the CC move): the improved-count is
        // the materializing action, one job per round — and when NO
        // distance improved the map is at its fixpoint, so the
        // remaining rounds would relax an empty frontier to the
        // identical result; skip them.
        val merged = dist.join(cand, Seq("node"), "full_outer")
          .select(col("node"),
            when(col("dist").isNull || (col("nd").isNotNull &&
              col("nd") < col("dist")), col("nd"))
              .otherwise(col("dist")).as("dist"),
            (col("dist").isNull || (col("nd").isNotNull &&
              col("nd") < col("dist"))).as("improved"))
          .coalesce(parts).localCheckpoint(eager = false)
        val nImproved = merged.filter(col("improved")).count()
        dist = merged.select(col("node"), col("dist"))
        frontier = merged.filter(col("improved"))
          .select(col("node"), col("dist"))
        settled = nImproved == 0
        r += 1
      }
      dist
    } finally sym.unpersist(blocking = false)
  }
}
