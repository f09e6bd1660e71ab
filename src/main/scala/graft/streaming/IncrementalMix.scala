package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming training-mix gate — the TWENTY-FIRST twin, pairing with
  * batch q195: live quota-bounded collection, where each source admits
  * the doc_id-ordered prefix of whole documents whose cumulative token
  * count fits its allocation, and CLOSES permanently once the next doc
  * would overflow (q195's monotone gate: the running sum includes every
  * doc in order, so after the first exclusion all later docs are
  * excluded too — the live form of "stop collecting from this source,
  * its budget is spent").
  *
  * Determinism under disorder follows [[IncrementalSequencePack]]
  * verbatim: admission depends on every smaller doc_id of the source,
  * so a doc is judged only once the watermark passes its packing-order
  * clock; arrivals buffer per source, the watermark finalizes the
  * pending prefix through the persisted (lastDocId, cum) cursor, and
  * each admitted doc emits exactly once with its within-source
  * cumulative (q195's `cumw` column). Late-beyond-horizon docs drop;
  * the armed flush timer is tracked and re-arming deletes the
  * superseded registration (the OverlapProcessor hygiene). State per
  * source: the O(1) cursor plus the pending docs inside the disorder
  * horizon — and nothing at all accrues once the source closes beyond
  * the cursor update.
  *
  * The quota table is the caller's |sources|-row dimension (batch:
  * q182's waterfill output) — passed as a plain map, the broadcast-dim
  * contract in streaming form.
  *
  * Reference for the operator surface (not the algorithm): min-flink
  * KeyedStream.java:206-209 (keyed running state). Spec pins parity
  * with the q195 prefix rule under time-sliced and disordered feeds,
  * the permanent close, and exactly-once admission.
  */
object IncrementalMix {

  /** One arriving document; `ts` is the admission-order clock the
    * caller watermarks (doc_id mapped monotonically to event time). */
  case class Doc(source: String, docId: Long, nTok: Long,
      ts: java.time.Instant)

  /** One admitted document — q195's output row. */
  case class Taken(docId: Long, source: String, nTok: Long, cumw: Long)

  /** Per-source admission cursor: last judged doc + running tokens. */
  case class Cursor(lastDocId: Long, cum: Long)

  /** One buffered arrival (tsUs for the watermark comparison). */
  case class Pend(docId: Long, nTok: Long, tsUs: Long)

  def taken(docs: Dataset[Doc], quota: Map[String, Long],
      lateness: String): Dataset[Taken] = {
    require(quota.values.forall(_ >= 0L), "negative quota")
    val s = docs.sparkSession
    import s.implicits._
    docs
      .withWatermark("ts", lateness)
      .groupByKey(_.source)
      .transformWithState(new MixProcessor(quota),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

/** Keyed quota-gate state machine; top-level so the closure serializes
  * without a spec/session reference. A source absent from the quota
  * map has quota 0: every doc is judged and rejected (the q195 rule
  * for an unallocated source). */
class MixProcessor(quota: Map[String, Long]) extends StatefulProcessor[
    String, IncrementalMix.Doc, IncrementalMix.Taken] {
  import IncrementalMix.{Cursor, Doc, Pend, Taken}

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

  override def handleInputRows(key: String, rows: Iterator[Doc],
      timerValues: TimerValues): Iterator[Taken] = {
    rows.foreach { d =>
      pending.appendValue(Pend(d.docId, d.nTok, tsUs(d)))
    }
    flush(key, timerValues.getCurrentWatermarkInMs())
  }

  override def handleExpiredTimer(key: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[Taken] =
    flush(key, timerValues.getCurrentWatermarkInMs())

  private def flush(key: String, wmMs: Long): Iterator[Taken] = {
    val cutUs = wmMs * 1000L
    val all = pending.get().toArray
    val (ready, rest) = all.partition(_.tsUs < cutUs)
    var cur = if (cursor.exists()) cursor.get() else Cursor(-1L, 0L)
    val alloc = quota.getOrElse(key, 0L)
    val out = ready.sortBy(_.docId)
      .filter(_.docId > cur.lastDocId)
      .flatMap { p =>
        // the q195 rule: cum counts EVERY judged doc, admission is
        // cum <= alloc — monotone, so one overflow closes the source
        cur = Cursor(p.docId, Math.addExact(cur.cum, p.nTok))
        if (cur.cum <= alloc) Some(Taken(p.docId, key, p.nTok, cur.cum))
        else None
      }
    if (ready.nonEmpty) {
      cursor.update(cur)
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
