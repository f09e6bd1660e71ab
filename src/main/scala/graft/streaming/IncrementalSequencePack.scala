package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming sequence packer — the TWENTIETH twin, pairing with batch
  * q190 ([[graft.queries.Profiling.packSeqs]]): live context-window
  * packing of an unbounded document feed, where each doc's (bin, offset)
  * must equal what the batch next-fit greedy assigns — whatever the
  * batching and within-horizon disorder of arrivals.
  *
  * Next-fit is ORDER-SENSITIVE: a doc's assignment depends on every
  * smaller doc_id in its (source, chunk) shard, so a doc can only be
  * placed once no smaller doc_id can still arrive. The caller maps the
  * packing order onto the event-time clock (ts = doc_id as
  * epoch-millis — the append-only-log convention) and declares a
  * disorder horizon via the watermark; the processor then buffers
  * arrivals per shard, and once the watermark passes a doc's ts its
  * position is FINAL: the pending prefix folds through the shard's
  * persisted (lastDocId, bin, fill) cursor in doc_id order and emits
  * exactly once. Docs at or below the emitted cursor are late by the
  * declared contract and drop (the WindowingSpec late-data rule).
  *
  * State per shard: the O(1) cursor + the pending docs inside the
  * disorder horizon — never the shard history (emitted docs leave
  * state), and a shard stops accruing anything once its doc_id range
  * has passed. Timer hygiene follows [[OverlapProcessor]]: the armed
  * flush timer is tracked in state and re-arming DELETES the superseded
  * registration. State schema is append-only (the OverlapProcessor
  * checkpoint doctrine).
  *
  * Reference for the operator surface (not the algorithm): min-flink
  * KeyedStream.java:206-209 (keyed running state); the packer itself is
  * the LLM-pipeline extension, pinned against batch q190 by
  * IncrementalSequencePackSpec under time-sliced and disordered feeds.
  */
object IncrementalSequencePack {

  /** One arriving document; `ts` is the packing-order clock the caller
    * watermarks (doc_id mapped monotonically to event time). */
  case class Doc(source: String, docId: Long, nTok: Long,
      ts: java.time.Instant)

  /** One finalized placement — q190's output row. */
  case class Assign(docId: Long, source: String, chunk: Long,
      binId: Long, off: Long, nTok: Long)

  /** Per-shard packing cursor after the last finalized doc. */
  case class Cursor(lastDocId: Long, bin: Long, fill: Long)

  /** One buffered arrival (tsUs for the watermark comparison). */
  case class Pend(docId: Long, nTok: Long, tsUs: Long)

  def packed(docs: Dataset[Doc], cap: Long, span: Long,
      lateness: String): Dataset[Assign] = {
    require(cap > 0 && span > 0, "cap and span must be positive")
    val s = docs.sparkSession
    import s.implicits._
    docs
      .withWatermark("ts", lateness)
      .groupByKey(d => (d.source, d.docId / span))
      .transformWithState(new SeqPackProcessor(cap),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Batch truth for the spec: q190's core on the same docs. */
  def batchTruth(docs: DataFrame, cap: Long, span: Long): DataFrame =
    graft.queries.Profiling.packSeqs(docs, cap, span)
}

/** Keyed packing state machine; top-level so the closure serializes
  * without a spec/session reference. */
class SeqPackProcessor(cap: Long) extends StatefulProcessor[
    (String, Long), IncrementalSequencePack.Doc,
    IncrementalSequencePack.Assign] {
  import IncrementalSequencePack.{Assign, Cursor, Doc, Pend}

  @transient private var cursor: ValueState[Cursor] = _
  @transient private var pending: ListState[Pend] = _
  @transient private var armed: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cursor = getHandle.getValueState[Cursor]("cursor",
      Encoders.product[Cursor], TTLConfig.NONE)
    pending = getHandle.getListState[Pend]("pending",
      Encoders.product[Pend], TTLConfig.NONE)
    armed = getHandle.getValueState[Long]("armedTimer",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  private def tsUs(d: Doc): Long =
    d.ts.getEpochSecond * 1000000L + d.ts.getNano / 1000L

  override def handleInputRows(key: (String, Long), rows: Iterator[Doc],
      timerValues: TimerValues): Iterator[Assign] = {
    rows.foreach { d =>
      pending.appendValue(Pend(d.docId, math.min(d.nTok, cap), tsUs(d)))
    }
    flush(key, timerValues.getCurrentWatermarkInMs())
  }

  override def handleExpiredTimer(key: (String, Long),
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[Assign] =
    flush(key, timerValues.getCurrentWatermarkInMs())

  /** Finalize every pending doc the watermark has passed: fold the
    * doc_id-sorted ready prefix through the persisted cursor (the exact
    * q190 recurrence), emit once each, keep the rest buffered, and arm
    * ONE tracked timer at the earliest surviving arrival so abandoned
    * shards still drain. */
  private def flush(key: (String, Long), wmMs: Long): Iterator[Assign] = {
    val cutUs = wmMs * 1000L
    val all = pending.get().toArray
    val (ready, rest) = all.partition(_.tsUs < cutUs)
    var cur = if (cursor.exists()) cursor.get() else Cursor(-1L, 0L, 0L)
    val out = ready.sortBy(_.docId)
      // at/below the cursor = late beyond the declared horizon: dropped,
      // never re-packed (re-packing would contradict an earlier emission)
      .filter(_.docId > cur.lastDocId)
      .map { p =>
        val (bin, fill) =
          if (cur.bin == 0L || cur.fill + p.nTok > cap) (cur.bin + 1L, p.nTok)
          else (cur.bin, cur.fill + p.nTok)
        cur = Cursor(p.docId, bin, fill)
        Assign(p.docId, key._1, key._2, bin, fill - p.nTok, p.nTok)
      }
    if (out.nonEmpty) cursor.update(cur)
    if (ready.nonEmpty) {
      pending.clear()
      rest.foreach(pending.appendValue)
    }
    val prev = if (armed.exists()) Some(armed.get()) else None
    if (rest.nonEmpty) {
      val target = rest.map(_.tsUs).min / 1000L + 1L
      if (!prev.contains(target)) {
        prev.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(target)
        armed.update(target)
      }
    } else {
      prev.foreach(getHandle.deleteTimer)
      armed.clear()
    }
    out.iterator
  }
}
