package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming twin of the interval-overlap join (batch binned q160,
  * native sweep q185) — the SEVENTEENTH twin: live interval matching,
  * where both sides are unbounded streams of validity windows /
  * in-transit spans arriving arbitrarily disordered within a declared
  * horizon. Structured Streaming's stream-stream joins can express a
  * range condition on two TIMESTAMPS but not on two INTERVALS (the
  * state watermark it derives cannot see a separate end column), so
  * this twin is the keyed-state machine on transformWithState +
  * event-time timers:
  *
  *  - each arriving interval pairs IMMEDIATELY with every buffered
  *    opposite-side interval it overlaps (`x.s <= o.e && o.s <= x.e`,
  *    closed bounds — the exact q160/q185 condition): a pair emits
  *    exactly once, at whichever member is PROCESSED later, which
  *    makes emission order-insensitive under any disorder;
  *  - an interval is evicted once the watermark (on interval START)
  *    passes its END: every future on-time arrival starts at or after
  *    the watermark, hence after the evicted end — no overlap is
  *    possible. State per key is therefore the intervals whose spans
  *    reach the watermark — the live concurrency plus the disorder
  *    horizon, NOT the stream so far (q161 measures precisely this
  *    quantity); event-time timers run the eviction for keys the data
  *    stopped visiting.
  *
  * Late arrivals (start below the watermark) are dropped by the
  * engine's watermark filter before the processor — the standard
  * Structured Streaming lateness contract the other event-time twins
  * (IncrementalAsof, IncrementalRangeJoin) share.
  */
object IncrementalOverlap {

  /** One tagged interval: `ts` (the START — the watermarked event-time
    * column), `endUs` (closed end, epoch-µs), side 0 = right,
    * 1 = left. */
  case class Iv(key: Long, ts: java.time.Instant, endUs: Long, side: Int,
      id: Long)

  /** One emitted overlap pair. */
  case class Pair(key: Long, leftId: Long, rightId: Long)

  /** (startUs, endUs, id) state cell. */
  case class Cell(startUs: Long, endUs: Long, id: Long)

  def pairs(events: Dataset[Iv], lateness: String): Dataset[Pair] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.key)
      .transformWithState(new OverlapProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Batch truth for the spec: the NATIVE sweep (q185's operator) on
    * the same tagged frame. */
  def batchTruth(events: DataFrame): DataFrame = {
    val l = events.filter(col("side") === 1)
      .select(col("key"), unix_micros(col("ts")).as("s0"),
        col("endUs").as("e0"), col("id").as("leftId"))
    val r = events.filter(col("side") === 0)
      .select(col("key"), unix_micros(col("ts")).as("rs0"),
        col("endUs").as("re0"), col("id").as("rightId"))
    graft.plans.OverlapJoin.join(l, r, "key", "s0", "e0", "rs0", "re0",
        Seq("rightId"))
      .select(col("key"), col("leftId"), col("rightId"))
  }
}

/** Keyed overlap state machine; top-level so the closure serializes
  * without a spec/session reference.
  *
  * State-schema note: `armedTimer` was ADDED after the first shipped
  * version of this processor. transformWithState stores each state
  * variable in its own column family, so restarting from a checkpoint
  * written BEFORE the addition is supported (the new variable starts
  * empty); on such a restart the first evictAndArm sees no tracked
  * expiry, cannot delete the pre-change stale timers, and simply arms
  * the tracked one — the stale timers then fire once as no-op eviction
  * passes and drain, converging to the tracked-single-timer regime.
  * REMOVING or RETYPING a state variable would not be compatible; this
  * codebase treats processor state schemas as append-only. */
class OverlapProcessor extends StatefulProcessor[
    Long, IncrementalOverlap.Iv, IncrementalOverlap.Pair] {
  import IncrementalOverlap.{Cell, Iv, Pair}

  @transient private var lefts: ListState[Cell] = _
  @transient private var rights: ListState[Cell] = _
  @transient private var armed: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    lefts = getHandle.getListState[Cell]("lefts",
      Encoders.product[Cell], TTLConfig.NONE)
    rights = getHandle.getListState[Cell]("rights",
      Encoders.product[Cell], TTLConfig.NONE)
    // the currently armed eviction timer, so re-arming replaces instead
    // of accumulating one stale no-op timer per batch per key
    armed = getHandle.getValueState[Long]("armedTimer",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  private def startUs(e: Iv): Long =
    e.ts.getEpochSecond * 1000000L + e.ts.getNano / 1000L

  override def handleInputRows(key: Long, rows: Iterator[Iv],
      timerValues: TimerValues): Iterator[Pair] = {
    // buffered copies: state reads inside the loop would see the rows
    // this same batch appends, double-emitting within-batch pairs —
    // instead pair against the in-memory view and append as we go
    val curL = scala.collection.mutable.ArrayBuffer(lefts.get().toSeq: _*)
    val curR = scala.collection.mutable.ArrayBuffer(rights.get().toSeq: _*)
    val out = scala.collection.mutable.ArrayBuffer.empty[Pair]
    rows.foreach { e =>
      val c = Cell(startUs(e), e.endUs, e.id)
      if (e.side == 1) {
        curR.foreach { r =>
          if (c.startUs <= r.endUs && r.startUs <= c.endUs)
            out += Pair(key, c.id, r.id)
        }
        curL += c; lefts.appendValue(c)
      } else {
        curL.foreach { l =>
          if (c.startUs <= l.endUs && l.startUs <= c.endUs)
            out += Pair(key, l.id, c.id)
        }
        curR += c; rights.appendValue(c)
      }
    }
    evictAndArm(timerValues.getCurrentWatermarkInMs())
    out.iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[Pair] = {
    evictAndArm(timerValues.getCurrentWatermarkInMs())
    Iterator.empty
  }

  /** Drop every interval whose end precedes the watermark (no future
    * on-time start can reach it) and arm a timer at the earliest
    * surviving end so abandoned keys still clean up. The armed expiry is
    * tracked in state: re-arming DELETES the previously registered timer
    * when the target moves — without that, every batch stacked a fresh
    * timer per key and each stale one later fired a no-op eviction pass
    * (round-7 advisory). */
  private def evictAndArm(wmMs: Long): Unit = {
    val cutUs = wmMs * 1000L
    var minEnd = Long.MaxValue
    def sweep(st: ListState[Cell]): Unit = {
      val kept = st.get().toArray.filter(_.endUs >= cutUs)
      st.clear()
      kept.foreach { c => st.appendValue(c); minEnd = minEnd min c.endUs }
    }
    sweep(lefts); sweep(rights)
    val prev = if (armed.exists()) Some(armed.get()) else None
    if (minEnd != Long.MaxValue) {
      val target = minEnd / 1000L + 1L
      if (!prev.contains(target)) {
        prev.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(target)
        armed.update(target)
      }
    } else {
      prev.foreach(getHandle.deleteTimer)
      armed.clear()
    }
  }
}
