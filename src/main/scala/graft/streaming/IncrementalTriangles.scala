package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming triangle census — the continuous twin of q196's
  * [[graft.operators.Triangles]] the way [[IncrementalGram]] is
  * q154's: the accumulated edge set is distributed state (one
  * localCheckpointed (u, v) frame, never driver-collected), each
  * arriving batch of edges is counted for the NEW triangles it closes,
  * and the running total equals the batch operator's census over the
  * edges seen so far — whatever the batching or arrival order
  * (IncrementalTrianglesSpec pins both).
  *
  * ==Delta counting without re-enumeration==
  * A batch's new triangles each contain >= 1 fresh edge, so candidates
  * come from fresh edges only: fresh (x, y) joined twice against the
  * union graph's directed adjacency finds every z with (x,z) and (y,z)
  * present. A triangle with 2 or 3 fresh edges appears once PER fresh
  * edge, so each candidate is kept only when its generating edge is the
  * lexicographically smallest FRESH edge of the triangle — the closing
  * edges carry an isNew flag through the join, making the tie-break one
  * struct comparison, no inclusion–exclusion, each new triangle counted
  * exactly once.
  *
  * Scale: per-batch cost is the fresh frontier joined against
  * adjacency — two hash exchanges keyed by node id over |fresh|-driven
  * rows (the q176 frontier discipline), never a re-enumeration of the
  * accumulated graph; state is the edge list itself, partition-resident.
  * Recovery = re-seeding from the last persisted edge snapshot plus the
  * emitted running total (the IncrementalGram contract).
  */
final class IncrementalTriangles extends Serializable {

  private var edges: DataFrame = null // (u, v), u < v, distinct
  private var tris: Long = 0L
  private var m: Long = 0L

  /** Triangles closed across all batches so far. */
  def totalTriangles: Long = tris

  /** Distinct edges absorbed so far. */
  def totalEdges: Long = m

  /** Current edge snapshot (distributed; for checkpoint/re-seed). */
  def edgeSnapshot: Option[DataFrame] = Option(edges)

  /** Re-seed from a persisted snapshot (columns u, v) + its census.
    * Fails loudly on a non-empty instance — seeding is a REPLACEMENT
    * of lost state, never a merge (the IncrementalBpe/KneserNey seed
    * contract): a silent double-seed would both double-count the
    * snapshot's census and leak the previously held localCheckpoint. */
  def reseed(snapshot: DataFrame, triangles: Long): Unit = {
    require(edges == null && tris == 0L && m == 0L,
      "graft IncrementalTriangles: reseed() on a non-empty instance")
    edges = snapshot.select(col("u"), col("v")).localCheckpoint()
    m = edges.count()
    tris = triangles
  }

  /** Absorb one batch of undirected edges (columns u, v — any
    * orientation; duplicates and re-deliveries tolerated). Returns the
    * number of new triangles this batch closed. */
  def update(batch: DataFrame): Long = {
    val canon = batch
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") < col("v")) // drops self-loops
      .distinct()
    val fresh = (if (edges == null) canon
      else canon.join(edges, Seq("u", "v"), "left_anti"))
      .localCheckpoint()
    val nFresh = fresh.count()
    if (nFresh == 0L) return 0L
    val flagged = fresh.withColumn("isNew", lit(true))
      .unionByName(if (edges == null) fresh.limit(0).withColumn("isNew", lit(false))
        else edges.withColumn("isNew", lit(false)))
    val dir = flagged
      .unionByName(flagged.select(col("v").as("u"), col("u").as("v"),
        col("isNew")))
    val f = fresh.select(col("u").as("x"), col("v").as("y"))
    val cand = f
      .join(dir.select(col("u").as("x"), col("v").as("z"),
        col("isNew").as("xzNew")), Seq("x"))
      .filter(col("z") =!= col("y"))
      .join(dir.select(col("u").as("y"), col("v").as("z"),
        col("isNew").as("yzNew")), Seq("y", "z"))
    val e1 = struct(col("x"), col("y"))
    val exz = struct(least(col("x"), col("z")), greatest(col("x"), col("z")))
    val eyz = struct(least(col("y"), col("z")), greatest(col("y"), col("z")))
    val delta = cand
      .filter((!col("xzNew") || e1 < exz) && (!col("yzNew") || e1 < eyz))
      .count()
    tris = Math.addExact(tris, delta)
    // the new snapshot materializes BEFORE the superseded blocks drop —
    // without the unpersists every batch would leave its predecessor's
    // checkpoint RDD cached and "bounded state" would quietly become
    // sum-over-batches (the OverlapProcessor hygiene rule)
    val prev = edges
    edges = (if (edges == null) fresh else edges.unionByName(fresh))
      .localCheckpoint()
    if (prev != null) prev.unpersist(blocking = false)
    fresh.unpersist(blocking = false)
    m = Math.addExact(m, nFresh)
    delta
  }
}
