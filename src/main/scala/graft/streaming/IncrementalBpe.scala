package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming BPE — the twin of batch q130/q149, with the WORD HISTOGRAM
  * held in KEYED EXECUTOR STATE instead of a driver map: the exact
  * shape [[IncrementalKneserNey]] demonstrated for bigram counts,
  * applied to the same histogram problem one level down. The round-9/10
  * version held a driver HashMap of every distinct word behind an
  * enforced 2M-word cap — bounded, but a ceiling; here there is no
  * driver histogram and therefore NO CAP AT ALL:
  *
  *  - each micro-batch explodes to its word stream distributed
  *    ([[words]] — document text never leaves the executors);
  *  - `transformWithState` keyed by the word adds the per-key batch
  *    delta into ValueState and EMITS one row per TOUCHED word carrying
  *    the new CUMULATIVE count — per-batch output is proportional to
  *    the batch, not the corpus, and counts are monotone;
  *  - monotonicity makes the downstream snapshot a pure max-compaction
  *    ([[table]]), and the merge-table/vocabulary derivation is batch
  *    q130's OWN distributed training fold ([[model]] =
  *    TextOps.bpeTrainFromHist — the knFromCounts doctrine: the twin
  *    and the batch share the algebra verbatim, so twin-vs-batch parity
  *    pins one implementation against the DuckDB oracle rather than two
  *    against each other). The fold is vocab-sized work per round and
  *    only each round's 1-row argmax reaches the driver.
  *
  * Restart recovery is the ENGINE's: state lives in the checkpoint
  * (RocksDB-backed in the specs) and a restarted query resumes the
  * counts exactly. Addition is Math.addExact (the q88 fail-loud
  * doctrine).
  *
  * Reference for the operator surface (not the algorithm):
  * min-flink KeyedStream.java:206-209 (reduce-style running state).
  */
object IncrementalBpe {

  /** One word occurrence. */
  case class Word(word: String)

  /** One emitted update: the new CUMULATIVE count of `word`. */
  case class CountUpdate(word: String, n: Long)

  /** Distributed explode of a document frame (string column `textCol`)
    * into its word stream — q130's corpus scan, reusable on a static OR
    * streaming frame. */
  def words(docs: DataFrame, textCol: String): Dataset[Word] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .as[Word]
  }

  /** The running histogram machine: keyed state by word, one emitted
    * [[CountUpdate]] per word touched in the batch. */
  def counts(ws: Dataset[Word]): Dataset[CountUpdate] = {
    val s = ws.sparkSession
    import s.implicits._
    ws.groupByKey(_.word)
      .transformWithState(new WordCountProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** Compact an accumulated update stream (word, n) to the CURRENT
    * histogram: counts are monotone, so the latest value per word is
    * its max — no batch-id bookkeeping needed. */
  def table(updates: DataFrame): DataFrame =
    updates.groupBy(col("word")).agg(max(col("n")).as("n"))

  /** The BPE model over the compacted histogram — batch q130/q149's
    * exact merge fold via the SHARED bpeTrainFromHist, as distributed
    * vocab-sized passes (caller persists `hist` if it will also read it
    * elsewhere; the fold checkpoints per round). Returns the per-round
    * 1-row merge frames and the final (word, n, repr) vocabulary. */
  def model(hist: DataFrame, rounds: Int): (Seq[DataFrame], DataFrame) =
    graft.queries.TextOps.bpeTrainFromHist(hist, rounds)
}

/** Keyed word-count state machine; top-level so the closure serializes
  * without a spec/session reference. State schema: one ValueState
  * column family "n" (cumulative count) — append-only per the
  * OverlapProcessor compatibility doctrine. */
class WordCountProcessor extends StatefulProcessor[
    String, IncrementalBpe.Word, IncrementalBpe.CountUpdate] {
  import IncrementalBpe.{CountUpdate, Word}

  @transient private var n: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[Word],
      timerValues: TimerValues): Iterator[CountUpdate] = {
    // count the batch's occurrences locally first: one state
    // read/write per TOUCHED word, not per occurrence
    var d = 0L
    rows.foreach(_ => d = Math.addExact(d, 1L))
    val c = Math.addExact(if (n.exists()) n.get() else 0L, d)
    n.update(c)
    Iterator.single(CountUpdate(key, c))
  }
}
