package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** Streaming twin of q143's distributed weighted median — EXACT online
  * quantiles, the eleventh twin: each flag's price→quantity histogram
  * accumulates in keyed MapState, and every micro-batch re-emits the
  * touched flags' CURRENT (total quantity, weighted median price). Exact
  * because the histogram is keyed by the VALUE, not a sketch bucket: the
  * price domain is bounded (2-decimal money), so state is
  * |distinct prices| fixed-width entries per flag — the conditions under
  * which online quantiles need no approximation at all, worth stating
  * against the usual t-digest/KLL reflex (those are for unbounded
  * domains; q50 covers that class).
  *
  * The map key is the price double's RAW BITS: for positive IEEE doubles
  * the bit pattern is monotone in the numeric value, so iterating keys
  * in numeric order needs only a long sort, and the exact double is
  * recovered bit-identically for emission (no decimal round-trip). The
  * crossing rule is q143's verbatim — first price whose doubled
  * cumulative quantity reaches the flag total; within one price the
  * batch query's (orderkey, linenumber) tiebreak cannot change which
  * PRICE crosses, so histogram granularity loses nothing.
  */
object IncrementalQuantiles {

  /** One lineitem's contribution. Price must be positive (bit-order
    * monotonicity); the generated money data is. */
  case class Ev(flag: String, price: Double, qty: Long)

  /** A flag's current weighted-median row. */
  case class Med(flag: String, totalQty: Long, medianPrice: Double)

  /** Project a Tables-shaped lineitem frame into the processor input —
    * the same columns batch q143 reduces. */
  def observations(lineitem: DataFrame): Dataset[Ev] = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    lineitem.select(col("l_returnflag").as("flag"),
      col("l_extendedprice").as("price"),
      col("l_quantity").cast("long").as("qty"))
      .as[Ev]
  }
}

/** Keyed price-histogram store; top-level class so the closure
  * serializes without a spec/session reference. */
class IncrementalQuantilesProcessor
    extends StatefulProcessor[String, IncrementalQuantiles.Ev,
      IncrementalQuantiles.Med] {
  import IncrementalQuantiles.{Ev, Med}

  @transient private var hist: MapState[Long, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    hist = getHandle.getMapState[Long, Long]("hist",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[Med] = {
    rows.foreach { e =>
      require(e.price > 0,
        s"graft IncrementalQuantiles: non-positive price ${e.price} breaks " +
          "bit-order monotonicity")
      val bits = java.lang.Double.doubleToLongBits(e.price)
      val cur = if (hist.containsKey(bits)) hist.getValue(bits) else 0L
      hist.updateValue(bits, Math.addExact(cur, e.qty))
    }
    val cells = hist.iterator().toArray.sortBy(_._1)
    val total = cells.foldLeft(0L)((a, c) => Math.addExact(a, c._2))
    var cum = 0L
    val crossing = cells.find { c =>
      cum = Math.addExact(cum, c._2); 2L * cum >= total
    }
    crossing match {
      case Some((bits, _)) =>
        Iterator.single(
          Med(key, total, java.lang.Double.longBitsToDouble(bits)))
      case None => Iterator.empty // no rows yet for this key
    }
  }
}
