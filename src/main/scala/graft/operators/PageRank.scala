package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact-integer PageRank — the second iterative graph operator next to
  * [[ConnectedComponents]] (duplicate-cluster centrality, source-graph
  * authority scoring: once near-dup edges exist, "which document is the
  * canonical center of its duplicate neighborhood" is a rank query).
  *
  * Takes a DIRECTED edge list (src, dst). Contract: every node must have
  * at least one out-edge — pass BOTH directions for an undirected graph
  * (the q105 shape); a sink node would silently leak its received mass
  * out of the system, and out-edge-less nodes never re-enter the rank
  * frontier. Like [[KMeans]], every step is exact integer arithmetic so
  * the fixed-iteration result is deterministic across engines,
  * partitionings and reruns (float PageRank can never be oracled — the
  * per-node contribution sum accumulates in partition order):
  *
  *  - ranks live in micro-units, r0 = 1,000,000 for every node;
  *  - per-edge contribution = rank div outdeg (truncating; all values
  *    nonnegative, so div == floor == DuckDB's `//`);
  *  - damping 0.85 as r' = 150,000 + (85 * sum) div 100.
  *
  * Scale design (100 TB graph): the classic Pregel shape — per iteration
  * ONE shuffle keyed by dst (the contribution aggregate) and one rank
  * join keyed by src. Edges are persisted PRE-PARTITIONED by src (the
  * exchange sits inside the cached plan, so InMemoryTableScan reports
  * HashPartitioning(src) downstream): the per-round out-flow join
  * re-shuffles only the node-sized rank frame, never the edge list —
  * 10 iterations cost ONE edge shuffle, not ten, which at a 100 TB edge
  * list is the difference between an iterative algorithm and an
  * accident. Degrees aggregate straight out of that partitioning (no
  * exchange) and stay co-partitioned for the same reason; both are
  * released in finally. Per-iteration localCheckpoint truncates lineage
  * so plans don't grow with the iteration count (the
  * ConnectedComponents contract). Integer headroom: total mass is
  * bounded by n * 1e6, so `85 * sum` stays under 2^63 while
  * n <= ~1e11 nodes — guarded fail-loud, like q88's decimal widths.
  */
object PageRank {

  /** Returns (node, pr) after `iters` exact iterations over `edges`
    * (first column src, second dst). Node set = distinct sources, and
    * EVERY source stays in the result each round: a node nothing points
    * at holds the damping floor 150,000 and keeps contributing its
    * out-flow (dropping it would leak its mass out of the system — the
    * directed-graph case the symmetric q105 edges never hit). */
  def run(edges: DataFrame, iters: Int): DataFrame =
    core(edges, iters, None)

  /** PERSONALIZED PageRank (random walk with restart): the restart mass
    * returns to the `seeds` set instead of spreading uniformly — the
    * taint-propagation query of a decontamination pipeline ("how much of
    * a flagged set's influence reaches each document", Haveliwala 2002;
    * the weighted continuation of q134's hop-count BFS). Same
    * exact-integer scheme as [[run]], restart vector personalized:
    * r0 = 1,000,000 on seeds / 0 elsewhere, and each round
    * r' = (150,000 if seed else 0) + (85 · Σ in-flow) div 100 — so total
    * mass stays bounded by the seed mass and every value is engine-exact.
    * `seeds` is a one-column node-id frame; ids outside the edge node
    * set are ignored (they have no edges to walk). Same contract and
    * scale shape as [[run]]: edges persisted pre-partitioned once, one
    * dst-keyed shuffle per round, node-sized rank frame. */
  def runPersonalized(edges: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame =
    core(edges, iters, Some(seeds))

  private def core(edges: DataFrame, iters: Int,
      seeds: Option[DataFrame]): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val cols = edges.columns
    val e = edges.select(col(cols(0)).as("src"), col(cols(1)).as("dst"))
      .repartition(col("src")) // cached WITH its exchange: see scaladoc
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg0 = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // the full node set with its restart share: uniform for run(),
    // seed-indicator for runPersonalized() (left-semi stamp, node-sized)
    val deg = seeds.fold(deg0.select(col("src"), col("deg"),
        lit(1L).as("is_seed"))) { sd =>
      val sCol = sd.columns(0)
      deg0.join(sd.select(col(sCol).as("src"), lit(1L).as("is_seed"))
          .distinct(), Seq("src"), "left")
        .select(col("src"), col("deg"),
          coalesce(col("is_seed"), lit(0L)).as("is_seed"))
    }.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // Two separate check jobs ON PURPOSE: deg.count() materializes the
      // e/deg persists first, so the sinks anti-join below PLANS against
      // accurate InMemoryRelation stats (broadcast anti-join). An r15
      // attempt to fold both counts into one crossJoin job planned the
      // anti-join against the raw 8-EB LogicalRDD estimate instead and
      // regressed q221 3.2 -> 11.5 s (measured twice) — the cache-stats
      // ordering is worth more than the saved job.
      val n = deg.count() // materializes e + deg for the whole run
      require(n <= 100000000000L,
        s"PageRank integer headroom exceeded: 85 * n * 1e6 must stay " +
          s"under 2^63, got n=$n nodes - widen ranks to DECIMAL first")
      // Fail-loud on the every-node-has-an-out-edge contract (q39's
      // broadcast-gate doctrine): a dst that never appears as src would
      // silently leak the mass it receives. One node-bounded anti-join,
      // paid once per run against the already-persisted edge frame.
      val sinks = e.select(col("dst")).distinct().as("d")
        .join(deg.as("g"), col("d.dst") === col("g.src"), "left_anti")
        .count()
      require(sinks == 0L,
        s"PageRank contract violated: $sinks destination node(s) have no " +
          "out-edge and would leak received mass - add both edge " +
          "directions (undirected) or explicit self-loops for sinks")
      var r = deg.select(col("src").as("node"),
        (col("is_seed") * lit(1000000L)).as("pr"))
      for (_ <- 1 to iters) {
        // out-flow per source: rank split evenly across its out-edges
        // (aliased: r0 derives from deg, so the first round is a
        // self-join by lineage)
        val w = r.as("r").join(deg.as("g"), col("r.node") === col("g.src"))
          .select(col("g.src").as("src"), expr("pr div deg").as("c"))
        val in = e.join(w, "src")
          .groupBy(col("dst"))
          .agg(sum(col("c")).as("s"))
        // rebuild over the FULL node set: an in-degree-0 node gets the
        // bare damping/restart term (s null -> 0), not silently dropped
        r = deg.select(col("src").as("node"),
            (col("is_seed") * lit(150000L)).as("rst")).as("nd")
          .join(in.as("in"), col("nd.node") === col("in.dst"), "left")
          .select(col("nd.node").as("node"),
            (col("rst") +
              expr("(85 * coalesce(s, 0L)) div 100")).as("pr"))
          .localCheckpoint() // node-sized; truncates per-round lineage
      }
      r
    } finally {
      deg.unpersist(blocking = false)
      e.unpersist(blocking = false)
    }
  }
}
