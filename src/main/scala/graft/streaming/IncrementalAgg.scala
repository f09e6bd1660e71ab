package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Streaming twin of q117's incremental aggregate maintenance — the
  * LIVE materialized view: each key's algebraic aggregate state
  * (count / sum / max — the same partials the batch query's map-side
  * combine uses) lives in a ValueState, every micro-batch folds its
  * rows in, and the processor emits the key's refreshed view row per
  * touched key per batch (update semantics: the sink's latest row per
  * key IS the view). Where q116/IncrementalCompaction keep ONE winning
  * row per key, this keeps a running FOLD — between them they cover the
  * two materialization primitives (pick-latest and accumulate) a CDC
  * consumer needs.
  *
  * Merge-order independence is the correctness argument: count/sum/max
  * are commutative monoids over exact integers, so ANY batching of the
  * stream folds to the same state as the batch recompute —
  * IncrementalAggSpec pins that equality against q117 (whose own gate
  * is incremental ≡ full recompute, making the chain streaming ≡
  * batch-incremental ≡ recompute).
  *
  * Scale: state is one fixed-size row per key, sharded by the engine's
  * user_id hash; per-batch cost is O(batch + touched keys), never
  * O(history) — q117's refresh economics, held continuously.
  */
object IncrementalAgg {

  /** One event's contribution; cents via the q85 floor idiom. */
  case class Contrib(userId: Long, tsMicros: Long, cents: Long)

  /** A key's live view row: the q117 output shape in epoch micros. */
  case class View(userId: Long, nEvents: Long, cents: Long,
      lastTsMicros: Long)

  /** Project a Tables-shaped events frame (streaming or batch) into the
    * processor's input; stateless, so it applies to readStream inputs
    * unchanged. */
  def contribs(events: DataFrame): Dataset[Contrib] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(
      col("user_id").cast("long").as("userId"),
      unix_micros(col("ts")).as("tsMicros"),
      floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .as[Contrib]
  }
}

/** Keyed algebraic-fold store; top-level class so the closure serializes
  * without a spec/session reference. */
class IncrementalAggProcessor extends StatefulProcessor[
    Long, IncrementalAgg.Contrib, IncrementalAgg.View] {
  import IncrementalAgg.{Contrib, View}

  @transient private var state: ValueState[View] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[View]("view",
      Encoders.product[View], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Contrib],
      timerValues: TimerValues): Iterator[View] = {
    var cur =
      if (state.exists()) state.get()
      else View(key, 0L, 0L, Long.MinValue)
    rows.foreach { c =>
      cur = View(key,
        cur.nEvents + 1,
        Math.addExact(cur.cents, c.cents),
        Math.max(cur.lastTsMicros, c.tsMicros))
    }
    state.update(cur)
    Iterator.single(cur)
  }
}
