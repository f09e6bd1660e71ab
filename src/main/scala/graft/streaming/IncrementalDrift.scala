package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** Streaming twin of q128's distribution drift — the LIVE drift monitor:
  * the reference (pre-cutoff) bucket distribution is fixed up front
  * (bucket-space-sized, broadcast into the processor), the post-cutoff
  * stream accumulates per-(type, bucket) counts in MapState, and every
  * micro-batch emits each touched type's CURRENT total-variation
  * distance as exact integers — the monitor a pipeline keeps against
  * its training snapshot to catch the moment fresh data stops looking
  * like what the model saw. Seventh streaming twin; the TV arithmetic
  * is q128's verbatim (Σ|n_i·M − m_i·N|, one division deferred to the
  * reader), so IncrementalDriftSpec can pin final-state equality with
  * the batch query.
  *
  * Scale: state per key is that type's OWN bucket map (≤ |buckets|
  * fixed-width entries — never the events), keyed by event_type, so a
  * hot type's updates land on one shard with map-side batching ahead
  * of it; the reference map rides the closure (bucket-space-sized,
  * exactly what q128 broadcasts).
  */
object IncrementalDrift {

  /** One post-cutoff event's contribution. */
  case class Obs(eventType: String, bucket: Long)

  /** A type's current drift row: exact numerator/denominator of the TV
    * distance vs the reference (tv = tvNum / tvDen, divided by the
    * reader — the q126/q128 exact-integer doctrine). */
  case class Drift(eventType: String, nRef: Long, nCur: Long,
      tvNum: Long, tvDen: Long)

  /** Project a Tables-shaped events frame into the processor's input
    * (post-cutoff rows only — the pre-cutoff side IS the reference). */
  def observations(events: DataFrame, cutoff: String): Dataset[Obs] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(col("ts") >= lit(cutoff).cast("timestamp"))
      .select(col("event_type").as("eventType"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 2500")
          .as("bucket"))
      .as[Obs]
  }

  /** The fixed reference: per-type bucket counts BEFORE the cutoff —
    * bucket-space-sized, computed once, shipped in the processor. */
  def reference(events: DataFrame,
      cutoff: String): Map[String, Map[Long, Long]] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(col("ts") < lit(cutoff).cast("timestamp"))
      .select(col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 2500")
          .as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
      .map { case (t, rows) => t -> rows.map(r => r._2 -> r._3).toMap }
  }
}

/** Keyed bucket-count store + TV emission; top-level class so the
  * closure serializes without a spec/session reference. */
class IncrementalDriftProcessor(ref: Map[String, Map[Long, Long]])
    extends StatefulProcessor[String, IncrementalDrift.Obs,
      IncrementalDrift.Drift] {
  import IncrementalDrift.{Drift, Obs}

  @transient private var counts: MapState[Long, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[Long, Long]("buckets",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[Obs],
      timerValues: TimerValues): Iterator[Drift] = {
    rows.foreach { o =>
      val cur = if (counts.containsKey(o.bucket)) counts.getValue(o.bucket)
        else 0L
      counts.updateValue(o.bucket, Math.addExact(cur, 1L))
    }
    val refMap = ref.getOrElse(key, Map.empty)
    val curMap: Map[Long, Long] = counts.iterator().toMap
    val nRef = refMap.valuesIterator.sum
    val nCur = curMap.valuesIterator.sum
    val tvNum = (refMap.keySet ++ curMap.keySet).toSeq.map { b =>
      Math.abs(Math.subtractExact(
        Math.multiplyExact(refMap.getOrElse(b, 0L), nCur),
        Math.multiplyExact(curMap.getOrElse(b, 0L), nRef)))
    }.sum
    Iterator.single(
      Drift(key, nRef, nCur, tvNum, 2L * nRef * nCur))
  }
}
