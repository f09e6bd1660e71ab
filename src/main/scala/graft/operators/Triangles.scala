package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle enumeration over an undirected simple graph via the
  * degree-ordered node iterator (Schank & Wagner '05; the orientation
  * trick Suri & Vassilvitskii '11 use for MapReduce triangle counting).
  * The reference engine has no graph analytics at all (SURVEY §1.3) —
  * this extends the q65/q105/q129/q157 graph family with the density
  * primitive: triangles and, downstream, clustering coefficients.
  *
  * Input: one row per undirected edge `(u, v)` with `u < v`, no
  * duplicates, no self-loops. Output: one row per triangle `(a, b, c)`
  * with `a < b < c` — each triangle exactly once.
  *
  * Scale design (100 TB): the naive wedge self-join explodes around
  * high-degree hubs (Σ deg² — quadratic in the hottest key). Orienting
  * every edge from its lower-(degree, id) endpoint to the higher one
  * caps every node's OUT-degree at O(√m), so the wedge join materializes
  * O(m^1.5) rows in total — the optimal exact-counting bound — and
  * closing a wedge is an equi-join against the oriented edge list on
  * both spokes. Three shuffles end to end: the degree aggregate, the
  * wedge join keyed by the pivot node, and the close join keyed by
  * (x, y); every intermediate row is three longs wide.
  */
object Triangles {

  /** `edges` must expose exactly two integral columns (u, v), u < v. */
  def run(edges: DataFrame): DataFrame = {
    val e = edges.toDF("u", "v")
    val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // stamp both endpoint degrees, then point the edge at the higher
    // (degree, id) endpoint; `ddst` rides along for the wedge ordering
    val stamped = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    // explicit width: AQE sizes reducers by INPUT bytes, but a wedge
    // join's output is quadratic in each pivot's out-degree — on a
    // dense graph a byte-coalesced single task would serialize the
    // whole O(m^1.5) expansion (the q120/q185 explosive-join lesson).
    // The width itself is sized by the WORK bound, not the session
    // default (the CC/Bfs graph-sized-parallelism rule): orientation
    // caps the wedge output at m^1.5 rows, so aim for ~1M expanded
    // rows per task, clamped to the pool — a test-scale graph stops
    // paying 32-task scheduling per stage for a few thousand edges,
    // while any graph big enough to need the pool still gets all of
    // it. Costs one count job over the (lazily checkpointed) oriented
    // frame, which the downstream wedge+close joins re-read anyway.
    val p = edges.sparkSession.sparkContext.defaultParallelism
    val oriented0 = stamped.select(
      when(fwd, col("u")).otherwise(col("v")).as("src"),
      when(fwd, col("v")).otherwise(col("u")).as("dst"),
      when(fwd, col("dv")).otherwise(col("du")).as("ddst"))
      .localCheckpoint(eager = false)
    val m = oriented0.count().toDouble
    val parts = math.max(1, math.min(p,
      (math.pow(m, 1.5) / 1e6).toInt + 1))
    val oriented = oriented0.repartition(parts, col("src"))
    // wedges (pivot, x, y) with (deg(x), x) < (deg(y), y): the closing
    // edge, if present, is oriented x -> y by the same comparator
    val w = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") &&
          (col("e1.ddst") < col("e2.ddst") ||
            (col("e1.ddst") === col("e2.ddst") &&
              col("e1.dst") < col("e2.dst"))))
      .select(col("e1.src").as("p"), col("e1.dst").as("x"),
        col("e2.dst").as("y"))
    w.join(oriented.select(col("src").as("x"), col("dst").as("y")),
        Seq("x", "y"))
      .select(array_sort(array(col("p"), col("x"), col("y"))).as("t"))
      .select(col("t")(0).as("a"), col("t")(1).as("b"), col("t")(2).as("c"))
  }

  /** Per-edge triangle support over the oriented census: one row per
    * input edge that closes >= 1 triangle, as (u, v, support) with
    * u < v. Edges in no triangle are ABSENT (support 0) — the q206
    * bridge-vs-clique signal and the k-truss peel predicate. One
    * narrow-column aggregate past [[run]]: each triangle lands at its
    * three edges. */
  def edgeSupport(edges: DataFrame): DataFrame =
    run(edges)
      .select(explode(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("a").as("u"), col("c").as("v")),
        struct(col("b").as("u"), col("c").as("v")))).as("e"))
      .groupBy(col("e.u").as("u"), col("e.v").as("v"))
      .agg(count(lit(1)).as("support"))

  /** Bounded-round k-truss peel (the edge-pruning dual of KCore's node
    * peel): per round, enumerate triangles on the SURVIVING edges and
    * drop every edge whose support falls below k-2 — support is
    * recomputed from scratch each round, so a cascade (an edge whose
    * only triangles died with a previously dropped edge) is caught by
    * the next round. Bounded rounds are the house recurrence contract
    * (PageRank's 3 damped iterations, Bfs's radius budget); the
    * convergence trace (round, edges_in, n_triangles, edges_kept) IS
    * the return value, three longs per round on the driver — the edge
    * set itself stays a checkpointed distributed frame throughout.
    * `edges` must follow [[run]]'s contract (u < v, deduplicated). */
  def trussPeel(edges: DataFrame, k: Int, rounds: Int)
      : Seq[(Int, Long, Long, Long)] = {
    require(k >= 3 && rounds >= 1,
      s"graft Triangles.trussPeel: need k >= 3 and rounds >= 1, got k=$k rounds=$rounds")
    var cur = edges.toDF("u1", "u2").localCheckpoint(eager = false)
    // round r's edges_in IS round r-1's edges_kept: count the input
    // once, then carry the kept count forward — two jobs per round
    // (support aggregate, kept count) instead of five (the lazy-
    // checkpoint-materialized-by-the-count move throughout).
    var edgesIn = cur.count()
    val stats = (1 to rounds).map { r =>
      val sup = edgeSupport(cur.select(col("u1"), col("u2")))
        .select(col("u").as("u1"), col("v").as("u2"), col("support").as("sup"))
        .localCheckpoint(eager = false)
      // every triangle contributed support to exactly its 3 edges;
      // this aggregate is the action that materializes sup's checkpoint
      val nTri = {
        val row = sup.agg(sum(col("sup"))).head()
        (if (row.isNullAt(0)) 0L else row.getLong(0)) / 3
      }
      val kept = sup.filter(col("sup") >= k - 2)
        .select(col("u1"), col("u2")).localCheckpoint(eager = false)
      val edgesKept = kept.count()
      cur.unpersist(blocking = false)
      sup.unpersist(blocking = false)
      cur = kept
      val row = (r, edgesIn, nTri, edgesKept)
      edgesIn = edgesKept
      row
    }
    cur.unpersist(blocking = false)
    stats
  }
}
