package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of q138's last-touch attribution — the LIVE attribution
  * ledger, and the tenth twin's NEW revision pattern: two event classes
  * interact in state across arrival order. A purchase is attributed the
  * moment it arrives, but a LATE-ARRIVING touch whose event time precedes
  * an already-attributed purchase (within the 7-day window and newer than
  * the touch credited so far) must RE-attribute it — the cross-class
  * revision that batch recomputation gets for free and an online ledger
  * must do explicitly. Every re-evaluation is stamped with the user's
  * monotone sequence number; readers keep max-seq per purchase, so the
  * ledger converges to exactly the batch answer (the q135-twin
  * train/serve-skew contract, applied to revenue attribution).
  *
  * State per key is the user's own touch/purchase history (per-entity
  * bounded, the q113 contract); the attribution rule is q138's verbatim:
  * latest touch with (us, id) < (purchase us, id) and within 7 days,
  * ties broken by the same total order, else 'direct'.
  */
object IncrementalAttribution {

  /** One event: epoch-µs, type, floor-cents (q138's scan projection). */
  case class Ev(eventId: Long, userId: Long, us: Long, eventType: String,
      cents: Long)

  /** A current attribution verdict for one purchase; seq = the user's
    * event count at evaluation time (monotone — readers keep max). */
  case class Att(userId: Long, purchaseId: Long, channel: String,
      cents: Long, seq: Long)

  val WindowUs: Long = 604800000000L // 7 days

  /** Project a Tables-shaped events frame into the processor input —
    * the ONE projection batch q138 also builds from, so the ledger and
    * the batch rollup cannot drift. */
  def observations(events: DataFrame): Dataset[Ev] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("event_id").as("eventId"), col("user_id").as("userId"),
        unix_micros(col("ts")).as("us"), col("event_type").as("eventType"),
        graft.functions.Cols.cents(col("value")).as("cents"))
      .as[Ev]
  }
}

/** Keyed touch/purchase history; top-level class so the closure
  * serializes without a spec/session reference. */
class IncrementalAttributionProcessor
    extends StatefulProcessor[Long, IncrementalAttribution.Ev,
      IncrementalAttribution.Att] {
  import IncrementalAttribution.{Att, Ev, WindowUs}

  @transient private var touches: ListState[Ev] = _
  @transient private var purchases: ListState[Ev] = _
  @transient private var seq: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    touches = getHandle.getListState[Ev]("touches",
      Encoders.product[Ev], TTLConfig.NONE)
    purchases = getHandle.getListState[Ev]("purchases",
      Encoders.product[Ev], TTLConfig.NONE)
    seq = getHandle.getValueState[Long]("seq", Encoders.scalaLong,
      TTLConfig.NONE)
  }

  private def order(e: Ev): (Long, Long) = (e.us, e.eventId)

  override def handleInputRows(key: Long, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[Att] = {
    var s = Option(seq.get()).getOrElse(0L)
    val newTouches = scala.collection.mutable.ArrayBuffer.empty[Ev]
    val newPurchases = scala.collection.mutable.ArrayBuffer.empty[Ev]
    rows.foreach { e =>
      s = Math.addExact(s, 1L)
      if (e.eventType == "purchase") { purchases.appendValue(e); newPurchases += e }
      else { touches.appendValue(e); newTouches += e }
    }
    seq.update(s)
    val allTouches = touches.get().toSeq
    val newPurchaseIds = newPurchases.map(_.eventId).toSet
    // a purchase needs re-evaluation when it is new, or when a new touch
    // lands inside its attribution window and precedes it
    val affected = purchases.get().filter { p =>
      newPurchaseIds.contains(p.eventId) ||
        newTouches.exists(t => Ordering[(Long, Long)].lt(order(t), order(p)) &&
          p.us - t.us <= WindowUs)
    }
    val sq = s
    affected.map { p =>
      // maxByOption, not sort: O(touches) per re-evaluation, no copy
      val credited = allTouches
        .filter(t => Ordering[(Long, Long)].lt(order(t), order(p)) &&
          p.us - t.us <= WindowUs)
        .maxByOption(order)
      Att(key, p.eventId, credited.map(_.eventType).getOrElse("direct"),
        p.cents, sq)
    }
  }
}
