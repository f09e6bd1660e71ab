package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of q172's per-entity changepoint — the LIVE
  * behavior-break monitor: each user's daily-spend histogram accumulates
  * in keyed MapState, and every micro-batch that touches a user re-emits
  * the CURRENT best split of their history (the day maximizing
  * |cum_i·n − total·i|, ties to the earliest day — q172's exact
  * all-integer rule), once the user has ≥ 8 active days. Sixteenth
  * streaming twin. This is churn/anomaly attribution served online: the
  * alert row a retention system reacts to, point-in-time consistent with
  * what the batch backfill (q172) computes over the same
  * [[IncrementalFeatures.observations]] projection — shared scan, so
  * online and offline cannot drift.
  *
  * Each emission carries the user's event sequence number (monotone per
  * key); readers keeping the max-seq row per user hold exactly the
  * current changepoint even as history is revised by late or
  * out-of-order events — a changepoint is a whole-history statistic, so
  * ANY day's revision can move it, and the recompute-on-touch contract
  * is the correct one (cost O(active days) per touched key, the q172
  * per-entity boundedness bound).
  *
  * State per key is the user's compacted day histogram — bounded by
  * ACTIVE DAYS, not events (the same |user×day| collapse q172's first
  * aggregate performs). `maxDays` makes that bound a loud contract:
  * a key exceeding it throws rather than growing silently (the q88/q131
  * fail-loud doctrine); arithmetic is Math.*Exact throughout, so the
  * split statistic can never silently wrap where batch DuckDB would
  * error.
  */
object IncrementalChangepoint {

  /** Current changepoint for a user: `nDays` active days, best split at
    * the `cpI`-th day (1-based, day `cpDay`), integer discrepancy
    * `disc` = |cum·n − total·i|; `seq` = the user's absorbed-event
    * count at emission (monotone — readers keep max). */
  case class Cp(userId: Long, nDays: Long, cpI: Long, cpDay: Long,
      disc: Long, seq: Long)
}

/** Keyed day-histogram store; top-level class so the closure serializes
  * without a spec/session reference. */
class IncrementalChangepointProcessor(maxDays: Int = 200000)
    extends StatefulProcessor[Long, IncrementalFeatures.Ev,
      IncrementalChangepoint.Cp] {
  import IncrementalChangepoint.Cp
  import IncrementalFeatures.Ev

  require(maxDays >= 8, "maxDays must admit the 8-day minimum history")

  @transient private var cells: MapState[Long, Long] = _
  @transient private var seq: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cells = getHandle.getMapState[Long, Long]("cells",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    seq = getHandle.getValueState[Long]("seq",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[Cp] = {
    var s = Option(seq.get()).getOrElse(0L)
    rows.foreach { e =>
      val cur = if (cells.containsKey(e.day)) cells.getValue(e.day) else 0L
      cells.updateValue(e.day, Math.addExact(cur, e.cents))
      s = Math.addExact(s, 1L)
    }
    seq.update(s)

    val hist = cells.iterator().toArray.sortBy(_._1)
    if (hist.length > maxDays) throw new IllegalStateException(
      s"graft IncrementalChangepoint: key $key exceeds $maxDays active " +
        "days - raise maxDays or pre-aggregate coarser")
    if (hist.length < 8) Iterator.empty
    else {
      val n = hist.length.toLong
      val total = hist.foldLeft(0L) { case (a, (_, c)) => Math.addExact(a, c) }
      var cum = 0L
      var bestI = 0L; var bestDay = 0L; var bestDisc = -1L
      var i = 0
      while (i < hist.length) {
        cum = Math.addExact(cum, hist(i)._2)
        val li = i + 1L
        // exact arithmetic: wraps THROW (batch's divide-compare guard,
        // taken as the streaming face of the same doctrine)
        val disc = Math.abs(Math.subtractExact(
          Math.multiplyExact(cum, n), Math.multiplyExact(total, li)))
        if (disc > bestDisc) { // strict: ties keep the EARLIEST split
          bestDisc = disc; bestI = li; bestDay = hist(i)._1
        }
        i += 1
      }
      Iterator.single(Cp(key, n, bestI, bestDay, bestDisc, s))
    }
  }
}
