package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of q131's per-user outlier detection — the LIVE anomaly
  * monitor: each user's running moment state (n, Σx, Σx²) plus their event
  * history accumulate in keyed state, and every micro-batch re-issues the
  * CURRENT verdict set for touched users under the same exact-integer
  * z-score test ((nx − s)² > k²(nq − s²), k = 2) the batch query applies.
  * Re-evaluating history on every batch is what makes the twin equal the
  * batch semantics: an early event can BECOME an outlier (or stop being
  * one) as its user's distribution fills in, exactly as a batch re-run
  * would conclude. Eighth streaming twin (dedup, k-means, similarity,
  * heavy hitters, CDC compaction, materialized view, drift, outliers).
  *
  * Scale: state per key is that user's own history (the q113/q116
  * per-entity boundedness contract — per-user event counts are the 15k
  * headroom q131 already guards) plus three longs of moments; emission is
  * per-touched-user only. All arithmetic Math.*Exact — overflow fails
  * loudly, never wraps (the determinism doctrine's streaming face).
  */
object IncrementalOutliers {

  /** One event's contribution: the value already floored to cents (the
    * same projection batch q131 applies at the scan). */
  case class Ev(eventId: Long, userId: Long, cents: Long)

  /** A current outlier verdict row; n is the user's event count at
    * emission time (monotone per user — consumers key "latest" off it).
    * Every touched user also emits ONE anchor row (eventId = -1) per
    * batch carrying the current n: a later evaluation that clears all
    * verdicts still advances the anchor, so a reader keeping "verdicts
    * whose n equals the user's max anchor n" holds exactly the current
    * set — without the anchor, an emptied verdict set would be
    * indistinguishable from no-news and stale verdicts would survive. */
  case class Out(userId: Long, eventId: Long, cents: Long, n: Long)

  /** Running moments. */
  case class Stats(n: Long, s: Long, q: Long)

  /** Project a Tables-shaped events frame into the processor input —
    * the ONE projection batch q131 also builds from, so the monitor and
    * the batch audit cannot drift. */
  def observations(events: DataFrame): Dataset[Ev] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id").as("eventId"),
      col("user_id").as("userId"),
      graft.functions.Cols.cents(col("value")).as("cents"))
      .as[Ev]
  }
}

/** Keyed history + moments store; top-level class so the closure
  * serializes without a spec/session reference. */
class IncrementalOutliersProcessor
    extends StatefulProcessor[Long, IncrementalOutliers.Ev,
      IncrementalOutliers.Out] {
  import IncrementalOutliers.{Ev, Out, Stats}

  @transient private var hist: ListState[Ev] = _
  @transient private var stats: ValueState[Stats] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    hist = getHandle.getListState[Ev]("hist",
      Encoders.product[Ev], TTLConfig.NONE)
    stats = getHandle.getValueState[Stats]("stats",
      Encoders.product[Stats], TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[Out] = {
    var st = Option(stats.get()).getOrElse(Stats(0L, 0L, 0L))
    val fresh = rows.toSeq
    fresh.foreach { e =>
      // the anchor sentinel is in-band (eventId = -1); a real event with
      // a negative id would be read as an anchor by downstream keepers —
      // fail loudly instead of silently corrupting the verdict stream
      require(e.eventId >= 0L,
        s"graft IncrementalOutliers: negative event_id ${e.eventId} " +
          "collides with the anchor sentinel (-1)")
      st = Stats(Math.addExact(st.n, 1L), Math.addExact(st.s, e.cents),
        Math.addExact(st.q, Math.multiplyExact(e.cents, e.cents)))
      hist.appendValue(e)
    }
    stats.update(st)
    require(st.n <= 15000L,
      s"graft IncrementalOutliers: user $key exceeds the 2^63 z-score " +
        "headroom (n > 15000) - widen to DECIMAL at this scale")
    val anchor = Iterator.single(Out(key, -1L, 0L, st.n))
    if (st.n < 12L) anchor
    else {
      val Stats(n, s, q) = st
      val varNum = Math.subtractExact(Math.multiplyExact(n, q),
        Math.multiplyExact(s, s))
      anchor ++ hist.get().flatMap { e =>
        val d = Math.subtractExact(Math.multiplyExact(n, e.cents), s)
        if (Math.multiplyExact(d, d) > Math.multiplyExact(4L, varNum))
          Iterator.single(Out(key, e.eventId, e.cents, n))
        else Iterator.empty
      }
    }
  }
}
