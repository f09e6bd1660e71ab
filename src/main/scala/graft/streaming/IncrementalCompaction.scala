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
  *
  * ==Retention contract==
  * An online CDC table cannot accept arbitrarily late changes forever:
  * a change arriving more than `retentionMicros` behind the key's own
  * event-time high water mark is NOT absorbed (it neither advances
  * `nChanges` nor can resurrect superseded state) — it is counted per
  * key and REPORTED as a `late = true` row carrying the rejected
  * change's fields with the key's cumulative late count in `nChanges`,
  * so every drop is auditor-visible. Within-retention out-of-order
  * changes keep the existing semantics (absorbed into `nChanges`, win
  * or lose by the deterministic (ts, event_id) order). The default
  * (`Long.MaxValue`) accepts forever — the backfill-parity
  * configuration IncrementalCompactionSpec's snapshot-equality runs
  * under.
  */
object IncrementalCompaction {

  /** One changelog record; ts in epoch micros (the Tables events
    * convention after nanos→µs truncation). */
  case class Change(userId: Long, tsMicros: Long, eventId: Long,
      eventType: String, cents: Long)

  /** A key's compacted state: the winning change + how many changes the
    * key has absorbed; `live = false` = latest change is a tombstone.
    * `late = true` rows are the retention REPORT channel: the fields
    * are the REJECTED change's, `nChanges` is the key's cumulative
    * late-drop count — never snapshot rows. */
  case class Snapshot(userId: Long, tsMicros: Long, eventId: Long,
      eventType: String, cents: Long, nChanges: Long, live: Boolean,
      late: Boolean = false)

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
  * without a spec/session reference. Default retention accepts forever
  * (the backfill-parity configuration); production passes a finite
  * horizon — see the retention contract above. */
class IncrementalCompactionProcessor(retentionMicros: Long = Long.MaxValue,
    maxFutureMicros: Long = Long.MaxValue)
    extends StatefulProcessor[
    Long, IncrementalCompaction.Change, IncrementalCompaction.Snapshot] {
  import IncrementalCompaction.{Change, Snapshot}

  require(retentionMicros > 0, "retentionMicros must be positive")
  require(maxFutureMicros > 0, "maxFutureMicros must be positive")

  @transient private var state: ValueState[Snapshot] = _
  @transient private var hwm: ValueState[Long] = _
  @transient private var nLate: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    state = getHandle.getValueState[Snapshot]("latest",
      Encoders.product[Snapshot], TTLConfig.NONE)
    hwm = getHandle.getValueState[Long]("hwm",
      Encoders.scalaLong, TTLConfig.NONE)
    nLate = getHandle.getValueState[Long]("nLate",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Change],
      timerValues: TimerValues): Iterator[Snapshot] = {
    val cs = rows.toSeq
    val prevHwm = Option(hwm.get()).getOrElse(Long.MinValue)
    // forward-skew guard (the IncrementalFeatures contract): a corrupt
    // far-future timestamp must not advance the hwm and poison the
    // retention cutoff for every legitimate change behind it
    val (futureCs, inCs) =
      if (prevHwm == Long.MinValue || maxFutureMicros == Long.MaxValue)
        (Seq.empty[Change], cs)
      else cs.partition(_.tsMicros > prevHwm + maxFutureMicros)
    // batch-wide event-time high water mark over ACCEPTED rows, so
    // acceptance does not depend on within-batch row order
    val wm = (prevHwm +: inCs.map(_.tsMicros)).max
    hwm.update(wm)
    val cutoff =
      if (retentionMicros == Long.MaxValue) Long.MinValue
      else wm - retentionMicros
    val (lateBehind, liveCs) = inCs.partition(_.tsMicros < cutoff)
    val lateCs = futureCs ++ lateBehind

    var cur = if (state.exists()) state.get() else null
    liveCs.foreach { c =>
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
    if (cur != null) state.update(cur)

    var lateCount = Option(nLate.get()).getOrElse(0L)
    val lateRows = lateCs.map { c =>
      lateCount = Math.addExact(lateCount, 1L)
      Snapshot(key, c.tsMicros, c.eventId, c.eventType, c.cents,
        lateCount, live = false, late = true)
    }
    if (lateRows.nonEmpty) nLate.update(lateCount)

    lateRows.iterator ++
      (if (liveCs.nonEmpty) Iterator.single(cur) else Iterator.empty)
  }
}
