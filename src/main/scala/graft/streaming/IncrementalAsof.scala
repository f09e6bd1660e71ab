package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming twin of [[graft.operators.TemporalJoins.asof]] (batch q57,
  * native q169) — the FIFTEENTH twin: live as-of enrichment, where both
  * the enriched stream AND the reference stream are unbounded and
  * arbitrarily disordered within a declared horizon. Structured
  * Streaming has no ASOF join, and the stream-stream range join
  * (IncrementalRangeJoin) cannot express "the LATEST right ≤ ts": that
  * needs order, which an inner join's emit-on-match cannot see. So this
  * twin is the full keyed-state machine on transformWithState +
  * event-time timers:
  *
  *  - left rows buffer until the watermark passes their event time —
  *    only then can no right row at-or-before them still arrive — and
  *    emit exactly once with the latest right ≤ their ts (event-time
  *    TIMERS flush keys the data stopped visiting);
  *  - right history is evicted below its watermark SHADOW: once a right
  *    row r2 with rts ≤ watermark exists, every older right is
  *    unreachable (any still-unemitted left has lts ≥ watermark ≥
  *    r2.rts, so r2 or newer wins) — state per key is the rows inside
  *    the disorder horizon plus ONE shadow row, not the stream so far.
  *
  * Emission uses the strictly-conservative `lts < watermarkUs` rule
  * (the watermark is ms-truncated; equality could still admit an
  * on-time right in the same microsecond band). The spec pins
  * batch-parity under time-sliced AND fully disordered feeds, plus the
  * eviction bound itself.
  */
object IncrementalAsof {

  /** One tagged input row: side 0 = right (reference), 1 = left
    * (enriched). `ts` is the event-time column the caller watermarks. */
  case class Ev(key: Long, ts: java.time.Instant, side: Int, id: Long)

  /** leftId enriched with the as-of partner (matched=false → no right
    * at-or-before within the key's history). */
  case class Match(leftId: Long, rightId: Long, matched: Boolean)

  /** (ts µs, id) state cell. */
  case class Cell(tsUs: Long, id: Long)

  def enriched(events: Dataset[Ev], lateness: String): Dataset[Match] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.key)
      .transformWithState(new AsofProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** [[enriched]]'s NEAREST-direction face (batch q165, native q174 —
    * the full merge-asof symmetry now holds across all three tiers):
    * each left waits until the watermark passes its ts + tolerance —
    * only then can no in-tolerance forward candidate still arrive —
    * and emits with whichever in-tolerance neighbor is closer,
    * backward winning distance ties (the TemporalJoins.nearest rule).
    * The right-history shadow shifts back by the tolerance: a right
    * below (watermark − tolerance) is dominated as a backward partner
    * by the shadow row and can never be a forward partner of a
    * still-unemitted left (whose ts is at or above that line). Price
    * of the direction: emission latency grows by the tolerance —
    * inherent, not implementation (the forward candidate must be
    * waited out). */
  def nearest(events: Dataset[Ev], lateness: String,
      toleranceUs: Long): Dataset[Match] = {
    require(toleranceUs >= 0, "negative tolerance")
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.key)
      .transformWithState(new NearestAsofProcessor(toleranceUs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Batch truth for the spec: TemporalJoins.asof on the same tagged
    * frame, as leftId → (rightId, matched). */
  def batchTruth(events: DataFrame): DataFrame = {
    val l = events.filter(col("side") === 1)
      .select(col("key"), col("ts"), col("id").as("leftId"))
    val r = events.filter(col("side") === 0)
      .select(col("key"), col("ts"), col("id").as("rightId"))
    graft.operators.TemporalJoins.asof(l, r, "key", "ts", Seq("rightId"))
      .select(col("leftId"), coalesce(col("rightId"), lit(-1L))
        .as("rightId"), col("rightId").isNotNull.as("matched"))
  }

  /** [[nearest]]'s batch truth: TemporalJoins.nearest, same shape. */
  def nearestTruth(events: DataFrame, toleranceUs: Long): DataFrame = {
    val l = events.filter(col("side") === 1)
      .select(col("key"), col("ts"), col("id").as("leftId"))
    val r = events.filter(col("side") === 0)
      .select(col("key"), col("ts"), col("id").as("rightId"))
    graft.operators.TemporalJoins
      .nearest(l, r, "key", "ts", Seq("rightId"), toleranceUs)
      .select(col("leftId"), coalesce(col("rightId"), lit(-1L))
        .as("rightId"), col("rightId").isNotNull.as("matched"))
  }
}

/** Keyed as-of state machine; top-level so the closure serializes
  * without a spec/session reference. */
class AsofProcessor extends StatefulProcessor[
    Long, IncrementalAsof.Ev, IncrementalAsof.Match] {
  import IncrementalAsof.{Cell, Ev, Match}

  @transient private var rights: ListState[Cell] = _
  @transient private var pending: ListState[Cell] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    rights = getHandle.getListState[Cell]("rights",
      Encoders.product[Cell], TTLConfig.NONE)
    pending = getHandle.getListState[Cell]("pending",
      Encoders.product[Cell], TTLConfig.NONE)
  }

  private def tsUs(e: Ev): Long =
    e.ts.getEpochSecond * 1000000L + e.ts.getNano / 1000L

  override def handleInputRows(key: Long, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[Match] = {
    rows.foreach { e =>
      val c = Cell(tsUs(e), e.id)
      if (e.side == 0) rights.appendValue(c) else pending.appendValue(c)
    }
    flush(timerValues.getCurrentWatermarkInMs())
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[Match] =
    flush(timerValues.getCurrentWatermarkInMs())

  /** Extra event-time a left must wait past its own ts before it can
    * emit (0 for backward; the tolerance for nearest, which must wait
    * out its forward candidate). Also shifts the eviction shadow. */
  protected def waitUs: Long = 0L

  /** The direction rule: the emitted partner for left `l` given the
    * key's (ts, id)-sorted right history. Backward here; nearest
    * overrides. */
  protected def matchFor(l: IncrementalAsof.Cell,
      rs: Array[IncrementalAsof.Cell]): Match = {
    // latest right at-or-before: rights unique per (key, ts) by the
    // operator contract, so the last qualifying cell is THE match
    val m = rs.takeWhile(_.tsUs <= l.tsUs).lastOption
    Match(l.id, m.map(_.id).getOrElse(-1L), m.isDefined)
  }

  private def flush(wmMs: Long): Iterator[Match] = {
    val cutoffUs = wmMs * 1000L - waitUs
    val rs = rights.get().toArray.sortBy(c => (c.tsUs, c.id))
    val (ready, rest) = pending.get().toArray.partition(_.tsUs < cutoffUs)
    val out = ready.sortBy(c => (c.tsUs, c.id)).map(matchFor(_, rs))
    pending.clear()
    rest.foreach(pending.appendValue)
    // evict below the (wait-shifted) watermark shadow: keep the newest
    // right with rts < cutoff and everything after it — older rights
    // are dominated backward by the shadow and cannot be forward
    // partners of any still-unemitted left (whose ts >= cutoff)
    val shadowIdx = rs.lastIndexWhere(_.tsUs < cutoffUs)
    if (shadowIdx > 0) {
      rights.clear()
      rs.drop(shadowIdx).foreach(rights.appendValue)
    }
    if (rest.nonEmpty)
      getHandle.registerTimer((rest.map(_.tsUs).min + waitUs) / 1000L + 1L)
    out.iterator
  }
}

/** [[AsofProcessor]] in direction='nearest' with an inclusive
  * tolerance: lefts wait out their forward horizon, the pick is the
  * closer in-tolerance neighbor, backward winning distance ties (the
  * TemporalJoins.nearest / native-exec rule). */
class NearestAsofProcessor(tolUs: Long) extends AsofProcessor {
  import IncrementalAsof.{Cell, Match}

  override protected def waitUs: Long = tolUs

  override protected def matchFor(l: Cell, rs: Array[Cell]): Match = {
    val b = rs.takeWhile(_.tsUs <= l.tsUs).lastOption
      .filter(c => l.tsUs - c.tsUs <= tolUs)
    val f = rs.find(_.tsUs > l.tsUs)
      .filter(c => c.tsUs - l.tsUs <= tolUs)
    val m = (b, f) match {
      case (Some(bb), Some(ff)) =>
        if (l.tsUs - bb.tsUs <= ff.tsUs - l.tsUs) Some(bb) else Some(ff)
      case (x, y) => x.orElse(y)
    }
    Match(l.id, m.map(_.id).getOrElse(-1L), m.isDefined)
  }
}
