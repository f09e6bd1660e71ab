package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of q76's sessionization — the twelfth twin, and the
  * only one whose state machine the engine already ships whole:
  * Structured Streaming's `session_window` aggregation merges adjacent
  * per-key windows inside the state store and closes a session exactly
  * when the event-time watermark passes its end. No custom processor —
  * the Spark-first form IS the operator (GWindows.session, shared with
  * batch q28), this file only fixes the q76 output contract on top.
  *
  * Semantics parity with batch q76 (break when gap >= 30 min): a
  * session window spans [first event, last event + gap) with an
  * EXCLUSIVE end, so an event landing exactly `gap` after its
  * predecessor starts a NEW session — the same >= break rule q76's lag
  * comparison implements. start_ts/end_ts come from min/max aggregates,
  * not window-bound arithmetic, so the contract is gap-parameterization-
  * proof.
  *
  * Lateness contract: the caller's `lateness` horizon sets the
  * watermark delay. In-horizon out-of-order events merge into (or
  * bridge!) existing open sessions — session merge is the one windowed
  * aggregate where a late row can REDUCE the row count. Beyond-horizon
  * events are dropped by the engine before the state store
  * (IncrementalSessionsSpec pins both sides); unlike the hand-built
  * features/compaction twins there is no report channel here — Append
  * mode cannot re-emit a closed window, which is exactly why the
  * horizon must be chosen per-deployment and is a required parameter.
  *
  * Scale: engine-managed per-key session state, sharded by the same
  * user_id hash the batch query shuffles on; emission is append-only
  * closed sessions — the per-entity-bounded-state doctrine all twelve
  * twins share.
  */
object IncrementalSessions {

  /** Closed-session stream over an events frame carrying (user_id, ts).
    * Emits one row per session once the watermark passes its close:
    * (user_id, start_ts, end_ts, n_events, duration_us) — batch q76's
    * shape minus the per-user ordinal (a stream cannot number sessions
    * it has not seen close yet; the spec derives ordinals by start_ts
    * order, which q76's numbering equals). Also correct on a BATCH
    * frame (watermark is a no-op there) — the batch/streaming parity
    * the spec exploits. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      lateness: String): DataFrame =
    GWindows.session(
      events.select(col("user_id"), col("ts")).withWatermark("ts", lateness),
      "ts", gap, Seq("user_id"),
      Seq(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"),
        max(col("ts")).as("end_ts")))
      .select(col("user_id"), col("start_ts"), col("end_ts"),
        col("n_events"),
        (unix_micros(col("end_ts")) - unix_micros(col("start_ts")))
          .as("duration_us"))
}
