package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Streaming twin of q116's changelog compaction — the live CDC table:
  * each key's last-write-wins state is a ValueState in the engine's
  * state store, every arriving change either supersedes it (strictly
  * greater (ts, event_id) — the same deterministic ordering the batch
  * query ranks by) or is ignored as late/out-of-order, and the
  * processor emits the key's refreshed snapshot row per touched key per
  * micro-batch (update semantics: the sink's latest row per key IS the
  * compacted table). Tombstones carry through as `live = false` rather
  * than vanishing — a downstream materializer needs the retraction, not
  * silence (the batch query's WHERE drops them at read time;
  * IncrementalCompactionSpec reconciles the two).
  *
  * Scale: state is one fixed-size row per key, sharded by the same
  * user_id hash the batch aggregate shuffles on; per-batch cost touches
  * only the keys the batch carries. This is [[IncrementalDedup]]'s
  * state discipline with ValueState-only layout — the simplest of the
  * five streaming twins, because upsert-compaction IS the primitive the
  * others build on.
  */
object IncrementalCompaction {

  /** One changelog record; ts in epoch micros (the Tables events
    * convention after nanos→µs truncation). */
  case class Change(userId: Long, tsMicros: Long, eventId: Long,
      eventType: String, cents: Long)

  /** A key's compacted state: the winning change + how many changes the
    * key has absorbed; `live = false` = latest change is a tombstone. */
  case class Snapshot(userId: Long, tsMicros: Long, eventId: Long,
      eventType: String, cents: Long, nChanges: Long, live: Boolean)

  /** Project a Tables-shaped events frame (streaming or batch) into the
    * processor's input: stateless, so it applies to readStream inputs
    * unchanged. Cents via the q85 floor idiom. */
  def changes(events: DataFrame): Dataset[Change] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(
      col("user_id").cast("long").as("userId"),
      unix_micros(col("ts")).as("tsMicros"),
      col("event_id").cast("long").as("eventId"),
      col("event_type").as("eventType"),
      floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .as[Change]
  }
}

/** Keyed latest-state store; top-level class so the closure serializes
  * without a spec/session reference. */
class IncrementalCompactionProcessor extends StatefulProcessor[
    Long, IncrementalCompaction.Change, IncrementalCompaction.Snapshot] {
  import IncrementalCompaction.{Change, Snapshot}

  @transient private var state: ValueState[Snapshot] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[Snapshot]("latest",
      Encoders.product[Snapshot], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Change],
      timerValues: TimerValues): Iterator[Snapshot] = {
    var cur = if (state.exists()) state.get() else null
    rows.foreach { c =>
      val supersedes = cur == null ||
        c.tsMicros > cur.tsMicros ||
        (c.tsMicros == cur.tsMicros && c.eventId > cur.eventId)
      cur =
        if (supersedes)
          Snapshot(key, c.tsMicros, c.eventId, c.eventType, c.cents,
            (if (cur == null) 0L else cur.nChanges) + 1,
            live = c.eventType != "error")
        else cur.copy(nChanges = cur.nChanges + 1)
    }
    state.update(cur)
    Iterator.single(cur)
  }
}
