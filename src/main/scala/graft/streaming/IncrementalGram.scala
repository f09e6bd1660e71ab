package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.GramAgg

/** Streaming Gram / online PCA — the continuous twin of q154/q155 the
  * way [[IncrementalHeavyHitters]] is q115's: the corpus Gram matrix
  * Σ v·vᵀ lives as running state between micro-batches, each arriving
  * batch is reduced to its OWN d² partial by one distributed GramAgg
  * pass (map-side partials — the vectors never reach the driver), and
  * the partials add. Addition is exactly the aggregate's executor-side
  * merge, so after any prefix of batches the state equals the batch
  * q154 answer over the rows seen so far — bit-for-bit, whatever the
  * batching. The current principal direction (q155's exact integer
  * power iteration, shared via [[GramAgg.principal]]) is then derivable
  * at any moment WITHOUT another corpus pass — the online embedding-
  * drift monitor: re-derive the direction per batch and watch it move.
  *
  * Running state is d² longs on the driver (d=64 → 32 KB) — the
  * IncrementalKMeans k-row contract. Run under `foreachBatch`; recovery
  * = re-seeding from the last emitted Gram snapshot (the state IS the
  * emission). All additions Math.addExact — the q88 fail-loud doctrine.
  */
final class IncrementalGram extends Serializable {

  private val buf = new GramAgg.Buffer

  /** Vectors absorbed so far, across all batches. */
  private var seen: Long = 0L
  def total: Long = seen

  /** Current Gram cells (row-major d²), empty before the first batch. */
  def gram: Array[Long] = if (buf.g == null) Array.empty[Long] else buf.g.clone()

  def dim: Int = buf.d

  /** Current dominant eigendirection (q155 arithmetic, `rounds` exact
    * integer power-iteration steps). Fails loudly before any data. */
  def principal(rounds: Int): Array[Long] =
    GramAgg.principal(gram, buf.d, rounds)

  /** Absorb one micro-batch of quantized vectors (`array<bigint>`
    * column `vecCol`): distributed Gram, driver-side add. */
  def update(batch: DataFrame, vecCol: String): Unit = {
    val row = batch
      // count(vecCol), not count(*): GramAgg skips NULL vectors, and
      // `total` must count what the Gram state actually absorbed
      .agg(GramAgg(col(vecCol)).as("gs"), count(col(vecCol)).as("n"))
      .head()
    val g = row.getSeq[Long](0)
    if (g.nonEmpty) {
      val d = math.sqrt(g.length.toDouble).toInt
      require(d * d == g.length,
        s"graft IncrementalGram: non-square partial of ${g.length} cells")
      val b = new GramAgg.Buffer
      b.d = d
      b.g = g.toArray
      buf.mergeFrom(b)
    }
    seen = Math.addExact(seen, row.getLong(1))
  }
}
