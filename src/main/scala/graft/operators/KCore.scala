package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous k-core peeling — the density filter on the near-dup
  * graph, sixth graph operator next to ConnectedComponents / PageRank /
  * LabelPropagation / Bfs / the triangle census. Where CC answers
  * "connected at all" and LPA "clusters densely around whom", the
  * k-core answers "which nodes remain after everything weakly attached
  * is peeled away": each round drops every node whose degree in the
  * CURRENT induced subgraph is < k. On a dedup graph this separates
  * true duplicate cliques from chains of borderline pairs — the
  * standard noise cut before cluster resolution.
  *
  * Determinism doctrine: the full k-core fixpoint is reached after at
  * most |V| rounds, but a FIXED round count is what an unrolled-CTE
  * oracle can state (the q105/q129/q134 doctrine) — and peeling is
  * monotone (each round's node set shrinks), so `rounds` rounds give a
  * well-defined supergraph of the true k-core that callers can tighten
  * by raising `rounds`. No ties, no randomness: the drop rule is a
  * per-node integer comparison.
  *
  * Scale shape: each round is one degree count over the current edge
  * set (map-side partials, src-partitioned — no exchange on the
  * persisted side), then two semi-joins inducing the surviving
  * subgraph; the src-side semi-join reuses the edge partitioning and
  * the dst side shuffles only the NODE-sized keep frame against it.
  * Edges shrink monotonically, so round cost decays; lineage is cut
  * per round (localCheckpoint, the CC contract).
  */
object KCore {

  /** pairs: two-column DataFrame of undirected edges. Returns
    * (node, deg): the nodes surviving `rounds` peels at threshold `k`,
    * with their degree in the surviving induced subgraph. */
  def run(pairs: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be >= 1")
    val u = pairs.columns(0)
    val v = pairs.columns(1)
    val sym0 = pairs.select(col(u).as("src"), col(v).as("dst"))
      .union(pairs.select(col(v).as("src"), col(u).as("dst")))
      .distinct()
      // lazy: the sizing count right below is the materializing action
      .localCheckpoint(eager = false)
    val n = sym0.count()
    val parts = math.max(1, math.min(
      pairs.sparkSession.sparkContext.defaultParallelism,
      (n / 1000000L).toInt + 1))
    var e = sym0.repartition(parts, col("src")).localCheckpoint()
    var m = n
    var r = 1
    var fixed = false
    while (r <= rounds && !fixed) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select(col("src").as("node"))
      // lazy checkpoint + count (the CC move): one job per round, and
      // the surviving-edge count is the fixpoint signal for free — a
      // round that drops NO edge leaves the induced subgraph identical,
      // so every later round is a no-op and the peel can stop early
      // with the same result.
      e = e
        .join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .repartition(parts, col("src")).localCheckpoint(eager = false)
      val mNext = e.count()
      fixed = mNext == m
      m = mNext
      r += 1
    }
    e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
  }
}
