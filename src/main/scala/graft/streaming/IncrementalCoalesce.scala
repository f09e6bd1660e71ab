package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of q199's interval coalescing — the twenty-second
  * twin: intervals arrive keyed and out-of-order within a declared
  * horizon, and each key's maximal covered span (gaps-and-islands
  * island) is emitted exactly once, the moment the event-time watermark
  * proves no future arrival can extend it. An island is extendable only
  * by an interval starting at or before its running max end, and
  * arrivals carry event time = their start, so `watermark > maxEnd`
  * closes it — the same strictly-greater split rule the batch window
  * applies, which also makes the streamed island INDEX equal q199's
  * (islands are disjoint and ordered; they finalize in span order).
  *
  * State per key: the unfinalized pending buffer + one O(1) open-island
  * record (frontier tuple, island counter, span) — the
  * [[IncrementalSequencePack]] discipline, including timer hygiene (one
  * tracked timer at the earliest pending start or the open span's end,
  * re-arming deletes the superseded registration) and the late rule
  * (an interval at/below the folded (s0, id) frontier arrived beyond
  * the horizon: dropped, never re-coalesced — re-opening would
  * contradict an earlier emission).
  */
object IncrementalCoalesce {

  /** One interval; s0/e0 in epoch micros, `ts` = s0 as the event-time
    * column the watermark rides. */
  case class Interval(k: Long, id: Long, s0: Long, e0: Long,
      ts: java.time.Instant)

  /** One closed island — batch q199's row shape. */
  case class Island(k: Long, island: Long, spanS0: Long, spanE0: Long,
      nIntervals: Long, coveredUs: Long)

  case class Pend(id: Long, s0: Long, e0: Long)

  /** Frontier + the open island (fields meaningful when `active`). */
  case class Open(lastS0: Long, lastId: Long, islandIdx: Long,
      start: Long, maxEnd: Long, n: Long, active: Boolean)

  /** Closed-island stream. Also correct on a batch frame via
    * [[batchTruth]] — the parity the spec pins. */
  def islands(intervals: Dataset[Interval],
      lateness: String): Dataset[Island] = {
    implicit val e: org.apache.spark.sql.Encoder[Island] =
      Encoders.product[Island]
    intervals
      .withWatermark("ts", lateness)
      .groupByKey(_.k)(Encoders.scalaLong)
      .transformWithState(new CoalesceProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The batch q199 recurrence over (k, id, s0, e0) — ONE definition
    * shared with queries.Temporal's q199 gate, so the streamed and
    * batch islands can never drift. */
  def batchTruth(i: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("s0"), col("id"))
    val pre = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cur = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    i.withColumn("pm", max(col("e0")).over(pre))
      .withColumn("island",
        sum(when(col("pm").isNull || col("s0") > col("pm"), 1L)
          .otherwise(0L)).over(cur))
      .groupBy(col("k"), col("island"))
      .agg(min(col("s0")).as("span_s0"), max(col("e0")).as("span_e0"),
        count(lit(1)).as("n_intervals"))
      .select(col("k"), col("island"), col("span_s0"), col("span_e0"),
        col("n_intervals"),
        (col("span_e0") - col("span_s0")).as("covered_us"))
  }
}

class CoalesceProcessor extends StatefulProcessor[Long,
    IncrementalCoalesce.Interval, IncrementalCoalesce.Island] {
  import IncrementalCoalesce.{Island, Interval, Open, Pend}

  @transient private var pending: ListState[Pend] = _
  @transient private var open: ValueState[Open] = _
  @transient private var armed: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    pending = getHandle.getListState[Pend]("pending",
      Encoders.product[Pend], TTLConfig.NONE)
    open = getHandle.getValueState[Open]("open",
      Encoders.product[Open], TTLConfig.NONE)
    armed = getHandle.getValueState[Long]("armedTimer",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Interval],
      timerValues: TimerValues): Iterator[Island] = {
    rows.foreach(r => pending.appendValue(Pend(r.id, r.s0, r.e0)))
    flush(key, timerValues.getCurrentWatermarkInMs())
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[Island] =
    flush(key, timerValues.getCurrentWatermarkInMs())

  private def flush(key: Long, wmMs: Long): Iterator[Island] = {
    val cutUs = wmMs * 1000L
    val all = pending.get().toArray
    val (ready, rest) = all.partition(_.s0 < cutUs)
    var st = if (open.exists()) open.get()
      else Open(Long.MinValue, Long.MinValue, 0L, 0L, 0L, 0L, active = false)
    val out = collection.mutable.ArrayBuffer.empty[Island]
    def close(): Unit = {
      out += Island(key, st.islandIdx, st.start, st.maxEnd, st.n,
        st.maxEnd - st.start)
      st = st.copy(active = false)
    }
    ready.sortBy(p => (p.s0, p.id))
      .filter(p => p.s0 > st.lastS0 ||
        (p.s0 == st.lastS0 && p.id > st.lastId))
      .foreach { p =>
        if (st.active && p.s0 > st.maxEnd) close()
        st =
          if (!st.active)
            Open(p.s0, p.id, st.islandIdx + 1L, p.s0, p.e0, 1L,
              active = true)
          else st.copy(lastS0 = p.s0, lastId = p.id,
            maxEnd = math.max(st.maxEnd, p.e0), n = st.n + 1L)
      }
    // the watermark clearing the open span closes it: every future
    // arrival starts at or after the watermark, so none can attach
    if (st.active && cutUs > st.maxEnd) close()
    open.update(st)
    if (ready.nonEmpty) {
      pending.clear()
      rest.foreach(pending.appendValue)
    }
    val wake = rest.map(_.s0) ++
      (if (st.active) Seq(st.maxEnd + 1L) else Nil)
    val prev = if (armed.exists()) Some(armed.get()) else None
    if (wake.nonEmpty) {
      val target = wake.min / 1000L + 1L
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
