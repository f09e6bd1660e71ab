package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming Kneser–Ney counts — the twin of batch q180, with the
  * bigram count table held in KEYED EXECUTOR STATE instead of a driver
  * map: `transformWithState` keyed by the LEFT word, MapState
  * w2 → cumulative count per key (the IncrementalGram shape at the
  * state layer, sharded the way IncrementalDedup shards its seen-keys).
  * The round-9 version `.collect()`ed every batch partial into a driver
  * HashMap of ALL distinct bigrams — the table is vocab²-bounded, i.e.
  * GROWS with the corpus (the exact hazard class the 86c4b26 broadcast
  * sweep retired on the batch side: at 100 TB a driver map of every
  * distinct bigram OOMs unboundedly, unlike every other twin's keyed
  * state). Here nothing corpus-proportional ever reaches the driver:
  *
  *  - each micro-batch explodes to its bigram stream distributed
  *    ([[bigrams]] — document text never leaves the executors);
  *  - the processor adds the per-key batch delta into MapState and
  *    EMITS one row per TOUCHED (w1, w2) carrying the new CUMULATIVE
  *    count — per-batch output is proportional to the batch, not the
  *    corpus, and counts are monotone;
  *  - monotonicity makes the downstream snapshot a pure max-compaction
  *    ([[table]]), and the full interpolated-KN model is ONE
  *    distributed derivation over that table ([[modelFrom]], which is
  *    q180's own `knFromCounts` — the twin and the batch share the
  *    algebra verbatim, so parity pins one implementation against the
  *    DuckDB oracle rather than two against each other).
  *
  * Restart recovery is the ENGINE's: state lives in the checkpoint
  * (RocksDB-backed in the specs) and a restarted query resumes the
  * counts exactly — strictly stronger than the old snapshot-reseed
  * contract. Addition is Math.addExact (the q88 fail-loud doctrine).
  *
  * Reference for the operator surface (not the algorithm):
  * min-flink KeyedStream.java:206-209 (reduce-style running state).
  */
object IncrementalKneserNey {

  /** One adjacent word pair. */
  case class Bigram(w1: String, w2: String)

  /** One emitted update: the new CUMULATIVE count of (w1, w2). */
  case class CountUpdate(w1: String, w2: String, c: Long)

  /** Distributed explode of a document frame (string column `textCol`)
    * into its adjacent-bigram stream — the q180 corpus scan, reusable
    * on a static OR streaming frame. */
  def bigrams(docs: DataFrame, textCol: String): Dataset[Bigram] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"))
        .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .as[Bigram]
  }

  /** The running count machine: keyed state by w1, one emitted
    * [[CountUpdate]] per (w1, w2) touched in the batch. */
  def counts(pairs: Dataset[Bigram]): Dataset[CountUpdate] = {
    val s = pairs.sparkSession
    import s.implicits._
    pairs.groupByKey(_.w1)
      .transformWithState(new KneserNeyProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** Compact an accumulated update stream (w1, w2, c) to the CURRENT
    * count table: counts are monotone, so the latest value per bigram
    * is its max — no batch-id bookkeeping needed. */
  def table(updates: DataFrame): DataFrame =
    updates.groupBy(col("w1"), col("w2")).agg(max(col("c")).as("c"))

  /** The interpolated-KN model over bigrams with c >= minC — batch
    * q180's exact BIGINT algebra via the SHARED knFromCounts, as one
    * distributed pass over the count table (caller persists `counts`
    * if it will also read it elsewhere; the derivation scans it 4x). */
  def modelFrom(counts: DataFrame, minC: Long = 1L): DataFrame =
    graft.queries.TextOps.knFromCounts(counts, minC)
}

/** Keyed count state machine; top-level so the closure serializes
  * without a spec/session reference. State schema: one MapState column
  * family "bigrams" (w2 → cumulative count) — append-only per the
  * OverlapProcessor compatibility doctrine. */
class KneserNeyProcessor extends StatefulProcessor[
    String, IncrementalKneserNey.Bigram, IncrementalKneserNey.CountUpdate] {
  import IncrementalKneserNey.{Bigram, CountUpdate}

  @transient private var m: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    m = getHandle.getMapState[String, Long]("bigrams",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[Bigram],
      timerValues: TimerValues): Iterator[CountUpdate] = {
    // fold the batch's occurrences locally first: one state read/write
    // per TOUCHED w2, not per occurrence
    val delta = scala.collection.mutable.HashMap.empty[String, Long]
    rows.foreach { r =>
      delta.update(r.w2, Math.addExact(delta.getOrElse(r.w2, 0L), 1L))
    }
    val out = delta.iterator.map { case (w2, d) =>
      val c = Math.addExact(
        if (m.containsKey(w2)) m.getValue(w2) else 0L, d)
      m.updateValue(w2, c)
      CountUpdate(key, w2, c)
    }.toVector
    out.iterator
  }
}
