package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming BPE — the NINETEENTH twin, pairing with batch q130/q149
  * the way [[IncrementalKneserNey]] pairs with q180: the WORD HISTOGRAM
  * is the running state (each micro-batch reduces to its own
  * vocab-bounded word-count partial — one distributed explode+aggregate,
  * text never reaches the driver — and partials ADD), and the entire
  * tokenizer is a pure derivation of the histogram: the merge rounds
  * only ever read (word, n), never the corpus, which is exactly the
  * q130 economy that makes BPE trainable at 100 TB in the first place.
  * So after any prefix of batches, [[model]] replays the training and
  * returns BIT-IDENTICAL merges and vocabulary to batch q130/q149 over
  * the documents seen so far — the live tokenizer-drift monitor a
  * growing corpus needs (watch the merge table churn as the mix
  * shifts; re-freeze the q189 serving vocab when it settles).
  *
  * The driver-side replay is an INDEPENDENT implementation of the
  * merge fold (left-to-right, non-cascading: a freshly merged symbol
  * never immediately re-merges as the lhs of the same pair — the
  * list_reduce contract of q130's oracle), so twin-vs-batch parity in
  * the spec cross-checks the two implementations against each other.
  * State is vocab-bounded (the broadcastable-model contract);
  * counts/seed give snapshot-based restart recovery, fail-loud on
  * double-seeding; all arithmetic Math.addExact (q88 doctrine).
  */
final class IncrementalBpe(
    /** Fail-loud ceiling on DISTINCT words held: the histogram is the
      * broadcastable-model contract's collateral — "vocab-bounded" is
      * still corpus-growing for raw whitespace tokens, so the bound is
      * ENFORCED, not assumed (round-9 advisory): one distributed
      * count gates every batch BEFORE its partial is collected, so an
      * adversarially wide batch dies as an error, never as a driver
      * OOM. 2M words ≈ 100 MB of driver strings — comfortably inside
      * the broadcast regime; a corpus that legitimately exceeds it
      * needs a pre-tokenization normalization pass, not a bigger
      * driver. */
    val maxDistinctWords: Long = 2000000L) extends Serializable {

  private val hist = scala.collection.mutable.HashMap.empty[String, Long]
  private var occ = 0L

  /** Word OCCURRENCES absorbed so far (Σn over the histogram). */
  def totalWords: Long = occ

  /** Distinct words held. */
  def distinctWords: Long = hist.size.toLong

  /** Absorb one micro-batch of documents (string column `textCol`):
    * distributed word-count partial, driver-side add. */
  def update(batch: DataFrame, textCol: String): Unit = {
    val counts = batch
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .persist()
    try {
      // the gate runs DISTRIBUTED, before anything reaches the driver
      val distinct = counts.count()
      require(distinct + hist.size <= maxDistinctWords,
        s"graft IncrementalBpe: batch would grow the histogram past " +
          s"maxDistinctWords=$maxDistinctWords (held ${hist.size}, " +
          s"batch-distinct $distinct) - the broadcastable-model " +
          "contract is violated; normalize the tokenization upstream")
      counts.collect().foreach { r =>
        val w = r.getString(0)
        val n = r.getLong(1)
        hist.update(w, Math.addExact(hist.getOrElse(w, 0L), n))
        occ = Math.addExact(occ, n)
      }
    } finally counts.unpersist(blocking = false)
  }

  /** The current histogram, for snapshot emission. */
  def counts: Seq[(String, Long)] =
    hist.iterator.map { case (w, n) => (w, n) }.toSeq

  /** Re-seed from an emitted snapshot (restart recovery) — a
    * REPLACEMENT of lost state, never a merge. */
  def seed(rows: Iterable[(String, Long)]): Unit = {
    require(hist.isEmpty && occ == 0L,
      "graft IncrementalBpe: seed() on a non-empty instance")
    require(rows.size <= maxDistinctWords,
      s"graft IncrementalBpe: snapshot of ${rows.size} words exceeds " +
        s"maxDistinctWords=$maxDistinctWords")
    rows.foreach { case (w, n) =>
      hist.update(w, n)
      occ = Math.addExact(occ, n)
    }
  }

  /** Replay `rounds` merge rounds on the histogram: the merge table
    * ((round, lhs, rhs, paircount) — q130's rows) and the final
    * vocabulary (word -> space-joined pieces — q149/q189's model).
    * O(rounds × Σ|word|) on vocab-bounded data; fails loudly on a
    * degenerate corpus with no adjacent pair (the q130 contract). */
  def model(rounds: Int)
      : (Seq[(Long, String, String, Long)], Map[String, String]) = {
    var repr: Map[String, Vector[String]] =
      hist.keysIterator.map(w => w -> w.split("").toVector).toMap
    val merges = Vector.newBuilder[(Long, String, String, Long)]
    for (r <- 1 to rounds) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      repr.foreach { case (w, syms) =>
        val n = hist(w)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pc.update(k, Math.addExact(pc.getOrElse(k, 0L), n))
          i += 1
        }
      }
      require(pc.nonEmpty,
        s"graft IncrementalBpe: merge round $r found no adjacent pair")
      val ((lhs, rhs), c) = pc.minBy { case ((l, h), n) => (-n, l, h) }
      merges += ((r.toLong, lhs, rhs, c))
      repr = repr.map { case (w, syms) =>
        // left-to-right, non-cascading: a merged symbol is never the
        // lhs of an immediate re-merge (the oracle's list_reduce walk)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { sym =>
          if (out.nonEmpty && out.last == lhs && sym == rhs)
            out(out.length - 1) = lhs + rhs
          else out += sym
        }
        w -> out.toVector
      }
    }
    (merges.result(), repr.map { case (w, s) => w -> s.mkString(" ") })
  }
}
