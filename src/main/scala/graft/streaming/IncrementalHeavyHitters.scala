package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.HeavyHitters

/** Streaming heavy hitters — the continuous twin of q115's sketch stage
  * the way [[IncrementalKMeans]] is q98's: a Misra-Gries summary lives as
  * running state between micro-batches, each arriving batch is reduced to
  * its own ≤ capacity summary by ONE distributed aggregate (map-side
  * partials — the batch text never reaches the driver), and the two
  * summaries merge under the mergeable-MG rule. Merging summaries is the
  * SAME operation the batch aggregate's executor-side merge performs, so
  * the N/(capacity+1) superset guarantee holds over the whole stream
  * regardless of how ingestion batched it — the candidate set after any
  * prefix is a valid sketch of that prefix.
  *
  * The running state is ≤ capacity (key, count) pairs on the driver —
  * the IncrementalKMeans k-row contract. Run under `foreachBatch`;
  * recovery = re-seeding from the last emitted summary snapshot.
  *
  * Like the batch sketch, candidates are a provable SUPERSET above the
  * guarantee threshold, not an answer: confirm with an exact count pass
  * over the accumulated corpus (the q115 second stage) when exact
  * verdicts are needed.
  */
final class IncrementalHeavyHitters(val capacity: Int) extends Serializable {
  require(capacity > 0)

  private val buf = new HeavyHitters.Buffer(capacity)

  /** Non-null tokens absorbed so far, across all batches. */
  def total: Long = buf.total

  /** Surviving (key, MG counter) pairs, key-sorted; each counter is a
    * lower bound on the key's true stream count. */
  def candidates: Seq[(String, Long)] =
    buf.counts.toSeq.map { case (k, c) => (k.toString, c) }.sortBy(_._1)

  /** Absorb one micro-batch: distributed sketch, driver-side merge. */
  def update(batch: DataFrame, tokenCol: String): Unit = {
    val row = batch
      .agg(HeavyHitters(col(tokenCol), capacity).as("sk"))
      .select(col("sk.total"), col("sk.cand"), col("sk.lb"))
      .head()
    val b = new HeavyHitters.Buffer(capacity)
    b.total = row.getLong(0)
    val ks = row.getSeq[String](1)
    val ls = row.getSeq[Long](2)
    var i = 0
    while (i < ks.length) {
      b.counts.update(UTF8String.fromString(ks(i)), ls(i))
      i += 1
    }
    buf.mergeFrom(b)
  }
}
