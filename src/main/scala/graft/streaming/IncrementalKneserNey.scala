package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming Kneser–Ney counts — the EIGHTEENTH twin, pairing with
  * batch q180 the way [[IncrementalGram]] pairs with q154: the bigram
  * count table lives as running state between micro-batches, each
  * arriving batch is reduced to its OWN vocab²-bounded count partial by
  * one distributed explode+aggregate pass (map-side partials — document
  * text never reaches the driver), and the partials ADD. Addition is
  * exactly the batch aggregate's merge, so after any prefix of batches
  * the count table equals q180's `bi` over the documents seen so far —
  * whatever the batching. Every OTHER model table is a pure driver-side
  * derivation of the counts (left-context totals cw1, fan-outs n1w1,
  * continuation counts ncont, distinct-bigram total B), so the full
  * interpolated-KN model — the exact BIGINT rational kn_num/kn_den of
  * the q180 algebra, discount 3/4 — is derivable at ANY moment without
  * another corpus pass: the online LM a live quality filter (q183's
  * gate) re-scores against as the corpus grows.
  *
  * Running state is the vocab²-bounded bigram table — the same bound
  * q183's model join rides (vocab²-sized, shuffled at scale, AQE-
  * broadcast while small), i.e. the codebase's existing
  * "model tables are dimension-sized" contract (IncrementalKMeans
  * k-row, IncrementalGram d², this one vocab²). Run under
  * `foreachBatch`; recovery = re-seeding from the last emitted count
  * snapshot ([[counts]]/[[seed]] — the state IS the emission, the
  * IncrementalGram doctrine). All arithmetic Math.addExact /
  * multiplyExact — the q88 fail-loud doctrine, strictly stronger than
  * the batch side's divide-compare guard.
  *
  * Reference for the operator surface (not the algorithm):
  * min-flink KeyedStream.java:206-209 (reduce-style running state).
  */
final class IncrementalKneserNey extends Serializable {
  import IncrementalKneserNey.KnRow

  private val bi =
    scala.collection.mutable.HashMap.empty[(String, String), Long]
  private var occ = 0L

  /** Bigram OCCURRENCES absorbed so far (Σc over the table). */
  def totalOccurrences: Long = occ

  /** Distinct bigrams held (the model's B). */
  def distinctBigrams: Long = bi.size.toLong

  /** Absorb one micro-batch of documents (string column `textCol`):
    * distributed bigram-count partial, driver-side add. */
  def update(batch: DataFrame, textCol: String): Unit = {
    val partial = batch
      .select(split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"))
        .as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
      .collect()
    partial.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      val c = r.getLong(2)
      bi.update(k, Math.addExact(bi.getOrElse(k, 0L), c))
      occ = Math.addExact(occ, c)
    }
  }

  /** The current count table, for snapshot emission. */
  def counts: Seq[(String, String, Long)] =
    bi.iterator.map { case ((w1, w2), c) => (w1, w2, c) }.toSeq

  /** Re-seed from an emitted snapshot (restart recovery). Fails loudly
    * on a non-empty instance: seeding is a REPLACEMENT of lost state,
    * never a merge (a merge would double-count the snapshot's prefix). */
  def seed(rows: Iterable[(String, String, Long)]): Unit = {
    require(bi.isEmpty && occ == 0L,
      "graft IncrementalKneserNey: seed() on a non-empty instance")
    rows.foreach { case (w1, w2, c) =>
      bi.update((w1, w2), c)
      occ = Math.addExact(occ, c)
    }
  }

  /** The interpolated-KN model over bigrams with c >= minC (q180
    * publishes minC = 5; a q183-style gate takes everything):
    * kn_num/kn_den = ((4c−3)·B + 3·N1+(w1,•)·N1+(•,w2)) / (4·c(w1•)·B),
    * every term derived from the count table alone. */
  def model(minC: Long = 1L): Seq[KnRow] = {
    val cw1 = scala.collection.mutable.HashMap.empty[String, Long]
    val n1w1 = scala.collection.mutable.HashMap.empty[String, Long]
    val ncont = scala.collection.mutable.HashMap.empty[String, Long]
    bi.foreach { case ((w1, w2), c) =>
      cw1.update(w1, Math.addExact(cw1.getOrElse(w1, 0L), c))
      n1w1.update(w1, n1w1.getOrElse(w1, 0L) + 1L)
      ncont.update(w2, ncont.getOrElse(w2, 0L) + 1L)
    }
    val b = bi.size.toLong
    bi.iterator.collect { case ((w1, w2), c) if c >= minC =>
      val num = Math.addExact(
        Math.multiplyExact(Math.multiplyExact(4L, c) - 3L, b),
        Math.multiplyExact(3L,
          Math.multiplyExact(n1w1(w1), ncont(w2))))
      val den = Math.multiplyExact(Math.multiplyExact(4L, cw1(w1)), b)
      KnRow(w1, w2, c, cw1(w1), n1w1(w1), ncont(w2), num, den)
    }.toSeq
  }
}

object IncrementalKneserNey {
  /** One scored bigram — q180's output row. */
  final case class KnRow(w1: String, w2: String, c: Long, cw1: Long,
      n1w1: Long, ncont: Long, kn_num: Long, kn_den: Long)
}
