package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over integer-quantized vectors — the
  * clustering primitive between raw embeddings and corpus organization
  * (topic balancing, IVF list construction, diversity sampling).
  *
  * Everything is exact integer arithmetic so the result is deterministic
  * across engines, partitionings and reruns (and therefore DuckDB-
  * oracle-able, which float k-means never is: float centroid means
  * accumulate in partition order):
  *
  *  - vectors arrive quantized to integer micro-units (the q43b/q60
  *    floor(x*1e6+0.5) convention — caller's responsibility);
  *  - init: centroids = the vectors of the k smallest ids (deterministic,
  *    no RNG — k-means++ would need a sequential weighted draw);
  *  - assignment: argmin of exact squared L2 distance, ties broken toward
  *    the lowest centroid id;
  *  - update: elementwise integer mean, `div` truncation (DuckDB's `//`
  *    truncates identically); a cluster that captures no points keeps its
  *    previous centroid (the carry-forward rule, not a respawn).
  *
  * Scale design (100 TB): per round the corpus is scanned ONCE —
  * assignment is a pure projection against the k×dim centroid table
  * collapsed into a single broadcast row (argmin via array_min over a
  * transform, no row amplification, no join explosion — a corpus×k
  * cross join would 8× the shuffle), and the update is one k-key
  * aggregate of 64 map-side partial sums (k·dim longs per partition
  * cross the wire). Centroids are k rows, checkpointed per round so
  * plans don't grow with the iteration count (the ConnectedComponents
  * lineage contract). The reference engine has no clustering at all
  * (SURVEY §1.3) — this is the training-data-pipeline extension class.
  */
object KMeans {

  /** Assignment of `vecs` (two columns: id, qv) under an EXPLICIT
    * centroid table (cid: int, cv: array<long>): argmin of exact squared
    * L2, lowest-cid tiebreak, via the centroid set folded into ONE
    * broadcast row. The argmin rides the native
    * [[graft.plans.NearestCentroid]] kernel — bit-identical to
    * `array_min(transform(cents, c -> struct(dist, cid)))` (lexicographic
    * struct min = nearest centroid with lowest-cid tiebreak) but
    * codegen'd: the HOF form evaluates interpreted and k-means pays it
    * k times per row per corpus scan (15.7 s -> ~1 s for the 10x-probe
    * assign). Returns (id, qv, cid, dist). Shared by the batch Lloyd
    * loop below and streaming.IncrementalKMeans' per-micro-batch step. */
  def assignUnder(vecs: DataFrame, cent: DataFrame): DataFrame = {
    val v = vecs.select(col(vecs.columns(0)).as("id"),
      col(vecs.columns(1)).as("qv"))
    // k rows to the driver — dimension-bounded state (the ivfSqParams
    // doctrine), embedded as a FOLDABLE literal so NearestCentroid
    // decodes the table once at codegen time instead of re-walking k
    // struct views per row (81 s -> 4 s for the 800-centroid 100x
    // assign). Assignment is then a pure projection: no join at all.
    val rows = cent.select(col("cid").cast("int"), col("cv")).collect()
    require(rows.nonEmpty, "graft KMeans.assignUnder: empty centroid table")
    val cents = typedlit(rows.toSeq.map(r => (r.getInt(0), r.getSeq[Long](1))))
    v.select(col("id"), col("qv"),
        graft.plans.NearestCentroid(col("qv"), cents).as("best"))
      .select(col("id"), col("qv"),
        col("best.cid").as("cid"), col("best.d").as("dist"))
  }

  /** The trained centroid table (cid: int, cv: array<long>) after
    * `iters` Lloyd update rounds over `vecs` (two columns: id,
    * qv-array<long> of length `dim`) — exposed separately from
    * [[assign]] so a trainer can fit on a SAMPLE and encode the full
    * corpus against the result (the PQ/IVF build shape: q146 trains on
    * a mod-sample, then encodes everything in one scan). The caller
    * owns vecs' cache scope (consumed iters times here). */
  def centroids(vecs: DataFrame, k: Int, iters: Int, dim: Int): DataFrame = {
    require(k >= 1 && iters >= 1 && dim >= 1)
    val v = vecs.select(col(vecs.columns(0)).as("id"),
      col(vecs.columns(1)).as("qv"))

    // init: the k lowest ids' vectors, cid = rank within that k-row set
    // (the window runs over k rows post-limit, never the corpus).
    // Checkpoints in this loop are LAZY: every round's assignUnder
    // begins by collect()ing the previous centroid frame into a plan
    // literal, and that collect IS the materializing action — an eager
    // checkpoint ran a second k-row job per round for nothing.
    var cent = v.orderBy(col("id")).limit(k)
      .select((row_number().over(Window.orderBy(col("id"))) - 1).as("cid"),
        col("qv").as("cv"))
      .localCheckpoint(eager = false)

    val sumCols = (0 until dim).map(i => sum(expr(s"qv[$i]")).as(s"s$i"))
    val divCols = (0 until dim).map(i => expr(s"s$i div n"))
    for (_ <- 1 to iters) {
      val sums = assignUnder(v, cent)
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n"), sumCols: _*)
      cent = cent.join(sums, Seq("cid"), "left")
        .select(col("cid"),
          when(col("n").isNull, col("cv"))
            .otherwise(array(divCols: _*)).as("cv"))
        // k rows; truncates per-round lineage — lazy, the next round's
        // collect (or the final assignUnder's) materializes it
        .localCheckpoint(eager = false)
    }
    cent
  }

  /** vecs: two-column DataFrame (id: long, qv: array<long>), every qv of
    * length `dim`. Returns (id, cluster: int, dist: long) — the
    * assignment under the centroids after `iters` Lloyd update rounds,
    * dist the exact squared distance to the winning centroid. The caller
    * owns vecs' cache scope (it is consumed iters+1 times); each round's
    * centroid refresh materializes eagerly here, so wrap the call in the
    * scratch contract (Dedup.withScratch) when caching.
    */
  def assign(vecs: DataFrame, k: Int, iters: Int, dim: Int): DataFrame = {
    val v = vecs.select(col(vecs.columns(0)).as("id"),
      col(vecs.columns(1)).as("qv"))
    assignUnder(v, centroids(v, k, iters, dim))
      .select(col("id"), col("cid").as("cluster"), col("dist"))
  }

  /** The flat argmin's k ceiling: past it the k×dim centroid table can
    * no longer ride a foldable plan literal / broadcast row (at dim 64
    * and k = 1e5 the table is ~50 MB embedded in every task binary —
    * the envelope Similarity's adaptive-k curve documents at n ≈ 25M
    * vectors), so [[assignAuto]] switches to the two-level path.
    * Overridable per session via `graft.kmeans.flatKCeiling` (specs pin
    * the selector by lowering it). */
  private[graft] val FlatKCeilingKey = "graft.kmeans.flatKCeiling"
  private[graft] val FlatKCeilingDefault = 100000

  /** [[assign]] with AUTOMATIC flat-vs-two-level selection: at or under
    * the ceiling this IS assign (bit-identical — the gate-SF contract);
    * past it the same (id, cluster, dist) surface is produced by
    * [[assignTwoLevel]], whose per-row cost is O(√k) comparisons
    * instead of O(k) and whose biggest single centroid table is
    * O(√k·dim) instead of O(k·dim) — the continuation that keeps the
    * adaptive-k consumers (q103/q110) alive past k ~ 1e5 without a
    * manual rewrite. */
  def assignAuto(vecs: DataFrame, k: Int, iters: Int, dim: Int): DataFrame = {
    val ceiling = vecs.sparkSession.conf
      .get(FlatKCeilingKey, FlatKCeilingDefault.toString).toInt
    if (k <= ceiling) assign(vecs, k, iters, dim)
    else assignTwoLevel(vecs, k, iters, dim)
  }

  /** Two-level (coarse × fine) k-means assignment producing ~k clusters:
    * k1 = ⌈√k⌉ coarse cells trained flat, then one GROUPED Lloyd job
    * ([[groupedCentroids]] — the q146/q210 machinery) trains
    * k2 = ⌈k/k1⌉ fine centroids inside every coarse cell, and the fine
    * argmin joins each row to ITS cell's codebook (plain equi-join on
    * the cell id — k1·k2·dim longs total across the table, shuffled not
    * broadcast-pinned; AQE still promotes it to broadcast while it
    * fits). cluster = coarse·k2 + fine, dist = exact squared L2 to the
    * winning FINE centroid. Deterministic like the flat path (lowest-id
    * init, lowest-cid ties, truncating div) but NOT the same partition
    * of the corpus as flat k-means with k clusters — callers switch
    * here for the Σ|c|²-bound contract (target cluster cardinality),
    * not for centroid-level equality. */
  def assignTwoLevel(vecs: DataFrame, k: Int, iters: Int,
      dim: Int): DataFrame = {
    require(k >= 2, s"two-level k-means needs k >= 2, got $k")
    val v = vecs.select(col(vecs.columns(0)).as("id"),
      col(vecs.columns(1)).as("qv"))
    val k1 = math.ceil(math.sqrt(k.toDouble)).toInt
    val k2 = (k + k1 - 1) / k1
    val coarse = centroids(v, k1, iters, dim)
    val asg1 = assignUnder(v, coarse)
      .select(col("id"), col("qv"), col("cid").as("g"))
    val fine = groupedCentroids(
      asg1.select(col("g"), col("id"), col("qv")), k2, iters, dim)
    val books = fine.groupBy(col("g"))
      .agg(collect_list(struct(col("cid"), col("cv"))).as("cents"))
    asg1.join(books, "g")
      .select(col("id"), col("g"),
        graft.plans.NearestCentroid(col("qv"), col("cents")).as("best"))
      .select(col("id"),
        (col("g") * k2 + col("best.cid")).cast("int").as("cluster"),
        col("best.d").as("dist"))
  }

  /** [[centroids]] for MANY independent problems at once: vecs carries a
    * GROUP column (g: int, id: long, qv: array<long> of `dim`) and each
    * group trains its own k-centroid codebook — bit-identically to
    * running [[centroids]] per group (same lowest-id init ranked within
    * the group, same argmin tiebreak, same truncating-div update), but
    * in ONE job per round instead of one per group. This is what makes
    * an M-subspace product quantizer trainable at the cost of a single
    * k-means: the sequential per-subspace loop paid ~M× the stage count
    * for the same arithmetic (the q146/q147/q148 bench finding).
    * Returns (g, cid, cv). */
  def groupedCentroids(vecs: DataFrame, k: Int, iters: Int,
      dim: Int): DataFrame = {
    require(k >= 1 && iters >= 1 && dim >= 1)
    val v = vecs.select(col(vecs.columns(0)).as("g"),
      col(vecs.columns(1)).as("id"), col(vecs.columns(2)).as("qv"))

    // init: per group the k lowest ids' vectors, cid = rank - 1; the
    // rank window shuffles once on g (k·|groups| rows survive)
    val wg = Window.partitionBy(col("g")).orderBy(col("id"))
    var cent = v
      .withColumn("rn", row_number().over(wg)).filter(col("rn") <= k)
      .select(col("g"), (col("rn") - 1).as("cid"), col("qv").as("cv"))
      // lazy (the centroids-loop rationale): each round's broadcast
      // build materializes the previous round's checkpoint; the caller's
      // action materializes the last — one eager k·|groups|-row job per
      // round bought nothing
      .localCheckpoint(eager = false)

    val sumCols = (0 until dim).map(i => sum(expr(s"qv[$i]")).as(s"s$i"))
    val divCols = (0 until dim).map(i => expr(s"s$i div n"))
    for (_ <- 1 to iters) {
      // per-group codebook folded to one row, broadcast-joined on g —
      // the grouped face of assignUnder's 1-row cross join
      val one = cent.groupBy(col("g"))
        .agg(collect_list(struct(col("cid"), col("cv"))).as("cents"))
      val asg = v.join(broadcast(one), "g")
        .select(col("g"), col("qv"),
          graft.plans.NearestCentroid(col("qv"), col("cents")).as("best"))
        .select(col("g"), col("qv"), col("best.cid").as("cid"))
      val sums = asg.groupBy(col("g"), col("cid"))
        .agg(count(lit(1)).as("n"), sumCols: _*)
      cent = cent.join(sums, Seq("g", "cid"), "left")
        .select(col("g"), col("cid"),
          when(col("n").isNull, col("cv"))
            .otherwise(array(divCols: _*)).as("cv"))
        .localCheckpoint(eager = false)
    }
    cent
  }
}
