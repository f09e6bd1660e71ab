package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of q135's trailing-window features — the LIVE feature
  * store: per-user day→spend cells accumulate in keyed MapState, and every
  * micro-batch re-emits the CURRENT (day_cents, 7-day trailing sum,
  * trailing active-day count) rows for exactly the days whose frame a
  * fresh event touched — the arriving day itself plus the six days whose
  * trailing window now includes it. This is the serving-side shape of
  * feature engineering: the online store stays point-in-time consistent
  * with what the batch backfill (q135) would compute, which is the
  * train/serve-skew guarantee feature platforms exist to provide. Ninth
  * streaming twin.
  *
  * Each emission carries the user's event sequence number (monotone per
  * key), so a reader keeping max-seq per (user, day) holds exactly the
  * current feature row even though day cells are revised by late events.
  * State per key is the user's own day map (the q113/q133 per-entity
  * boundedness contract); arithmetic is Math.*Exact — overflow fails
  * loudly (the determinism doctrine's streaming face).
  *
  * ==Retention contract==
  * A 100 TB online store cannot absorb arbitrarily late data forever —
  * unbounded lateness means unbounded day cells per key. The processor
  * takes `retentionDays`: each key tracks its own event-time high water
  * mark (max day seen), and an event landing more than `retentionDays`
  * behind it is NOT absorbed — it is counted per key and REPORTED as a
  * `late = true` row carrying the rejected (day, cents) and the key's
  * cumulative late count in `seq`, so a downstream auditor sees every
  * drop (never silent absorption, never silent loss). Day cells more
  * than `retentionDays + 6` behind the watermark are purged (the +6
  * keeps every accepted event's trailing frame exact — a cell just
  * inside the horizon still contributes to frames up to 6 days ahead).
  * Within-retention results are batch-identical: on-time parity is
  * unconditional, and the default (`Long.MaxValue`) retains forever,
  * which IncrementalFeaturesSpec's backfill-equality test runs under.
  *
  * The horizon has a FORWARD face too (`maxFutureDays`): with finite
  * retention, a single corrupt far-future timestamp would otherwise
  * advance the key's high-water mark irreversibly and reject every
  * legitimate event behind the poisoned cutoff forever. Once a key has
  * a reference hwm, events more than `maxFutureDays` ahead of it are
  * routed to the same report channel as late drops — visible, never
  * absorbed, never hwm-advancing. A real forward jump larger than the
  * bound (pipeline downtime) shows up as reported rows, which is the
  * alarm an operator wants anyway. Default: unbounded (backfill
  * parity).
  */
object IncrementalFeatures {

  /** One event's contribution: epoch-day + floor-cents (the exact q135
    * scan projection). */
  case class Ev(userId: Long, day: Long, cents: Long)

  /** A current feature row for (userId, day); seq = the user's event
    * count when this row was computed (monotone — readers keep max).
    * `late = true` rows are the retention REPORT channel: day/cents are
    * the rejected event's, seq is the key's cumulative late-drop count,
    * and the frame columns are zero — never feature rows. */
  case class Feature(userId: Long, day: Long, dayCents: Long,
      t7Cents: Long, t7Days: Long, seq: Long, late: Boolean = false)

  /** Project a Tables-shaped events frame into the processor input —
    * the ONE (user, day, cents) projection batch q135 also builds from
    * (Cols.cents/epochDay), so online and backfill cannot drift. */
  def observations(events: DataFrame): Dataset[Ev] = {
    val spark = events.sparkSession
    import spark.implicits._
    import graft.functions.Cols
    events.select(col("user_id").as("userId"),
      Cols.epochDay(col("ts")).as("day"),
      Cols.cents(col("value")).as("cents"))
      .as[Ev]
  }
}

/** Keyed day-cell store; top-level class so the closure serializes
  * without a spec/session reference. Default retention keeps every day
  * cell forever (the backfill-parity configuration); production passes
  * a finite horizon — see the retention contract above. */
class IncrementalFeaturesProcessor(retentionDays: Long = Long.MaxValue,
    maxFutureDays: Long = Long.MaxValue)
    extends StatefulProcessor[Long, IncrementalFeatures.Ev,
      IncrementalFeatures.Feature] {
  import IncrementalFeatures.{Ev, Feature}

  require(retentionDays > 0, "retentionDays must be positive")
  require(maxFutureDays > 0, "maxFutureDays must be positive")

  @transient private var cells: MapState[Long, Long] = _
  @transient private var seq: ValueState[Long] = _
  @transient private var hwm: ValueState[Long] = _
  @transient private var nLate: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cells = getHandle.getMapState[Long, Long]("cells",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    seq = getHandle.getValueState[Long]("seq",
      Encoders.scalaLong, TTLConfig.NONE)
    hwm = getHandle.getValueState[Long]("hwm",
      Encoders.scalaLong, TTLConfig.NONE)
    nLate = getHandle.getValueState[Long]("nLate",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[Feature] = {
    val evs = rows.toSeq
    val prevHwm = Option(hwm.get()).getOrElse(Long.MinValue)
    // forward-skew guard: one corrupt far-future day must not advance
    // the high-water mark and permanently reject every legitimate event
    // behind the resulting cutoff. Once a reference hwm exists, events
    // more than maxFutureDays ahead of it are REPORTED (the same
    // never-silent channel as late drops), not absorbed.
    val (futureEvs, inEvs) =
      if (prevHwm == Long.MinValue || maxFutureDays == Long.MaxValue)
        (Seq.empty[Ev], evs)
      else evs.partition(_.day > prevHwm + maxFutureDays)
    // the key's event-time high water mark across this batch's ACCEPTED
    // rows — computed up front so acceptance is batch-order-independent
    // (determinism doctrine: same inputs, same drops, any row order)
    val wm = (prevHwm +: inEvs.map(_.day)).max
    hwm.update(wm)
    val cutoff =
      if (retentionDays == Long.MaxValue) Long.MinValue
      else wm - retentionDays
    val (lateBehind, liveEvs) = inEvs.partition(_.day < cutoff)
    val lateEvs = futureEvs ++ lateBehind

    var s = Option(seq.get()).getOrElse(0L)
    val touched = scala.collection.mutable.Set.empty[Long]
    liveEvs.foreach { e =>
      val cur = if (cells.containsKey(e.day)) cells.getValue(e.day) else 0L
      cells.updateValue(e.day, Math.addExact(cur, e.cents))
      touched += e.day
      s = Math.addExact(s, 1L)
    }
    seq.update(s)

    // report (never absorb) the beyond-horizon stragglers
    var lateCount = Option(nLate.get()).getOrElse(0L)
    val lateRows = lateEvs.map { e =>
      lateCount = Math.addExact(lateCount, 1L)
      Feature(key, e.day, e.cents, 0L, 0L, lateCount, late = true)
    }
    if (lateRows.nonEmpty) nLate.update(lateCount)

    // purge cells past frame reach of the horizon (cutoff - 6 keeps
    // every within-retention frame exact)
    if (cutoff != Long.MinValue) {
      val purgeBelow = cutoff - 6
      cells.keys().filter(_ < purgeBelow).toSeq.foreach(cells.removeKey)
    }

    val all: Map[Long, Long] = cells.iterator().toMap
    // a fresh cell at day t changes the frames of rows t .. t+6 (only
    // days that HAVE activity emit a row — the RANGE-frame contract)
    val affected = all.keySet.filter(d =>
      touched.exists(t => d >= t && d <= t + 6)).toSeq.sorted
    val sq = s
    lateRows.iterator ++ affected.iterator.map { d =>
      val frame = all.filter { case (k, _) => k >= d - 6 && k <= d }
      Feature(key, d, all(d),
        frame.valuesIterator.foldLeft(0L)(Math.addExact),
        frame.size.toLong, sq)
    }
  }
}
