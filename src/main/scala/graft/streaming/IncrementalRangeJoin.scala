package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.TemporalJoins.range]] (batch
  * q58) — the fourteenth twin, and the first to ride Structured
  * Streaming's native STREAM-STREAM join: both inputs are unbounded,
  * and the event-time range condition plus the two watermarks is what
  * makes that tractable — the engine derives a state watermark from
  * the join bounds and EVICTS every buffered row that can no longer
  * match (a left row is droppable once the right watermark passes
  * `l.ts + upper + lateness`, and symmetrically), so state is bounded
  * by |rows in the join horizon|, not by the stream so far. That
  * engine-managed eviction is exactly the hand-built per-entity state
  * contract the other thirteen twins enforce themselves, which is why
  * this operator needs no custom processor at all (the
  * IncrementalSessions precedent: the Spark-first form IS the
  * operator).
  *
  * The reference engine's only binary stream ops are union/connect
  * (SURVEY §2.7); a windowed two-stream join is the capability every
  * event pipeline builds next, and on a 1000-executor cluster both
  * sides shuffle on `key` into the SAME state-store sharding the batch
  * range join uses for its equi-join buckets.
  *
  * Inner-join semantics (the batch operator's contract): matches emit
  * as soon as both sides have arrived — the watermark gates STATE
  * EVICTION and late-row admission, not emission, so an Append-mode
  * sink sees each pair exactly once, immediately. Beyond-horizon
  * arrivals are dropped before the join state (the spec pins parity
  * under a covering horizon and time-sliced in-order feeds).
  *
  * Also correct on BATCH frames (watermarks are no-ops there) — the
  * batch/streaming parity surface the spec exploits against q58.
  */
object IncrementalRangeJoin {

  /** Every (left, right) pair sharing `key` with right.`ts` in
    * [left.`ts` + lowerUs, left.`ts` + upperUs] (inclusive µs bounds —
    * [[graft.operators.TemporalJoins.range]]'s exact contract).
    * Returns left's columns plus `rightPayload` (caller pre-renames to
    * avoid clashes). `lateness` is the REQUIRED disorder horizon on
    * both sides: it bounds how out-of-order either stream may be, and
    * with it the join-state retention window. */
  def ranged(left: DataFrame, right: DataFrame, key: String, ts: String,
      lowerUs: Long, upperUs: Long, lateness: String,
      rightPayload: Seq[String]): DataFrame = {
    require(upperUs >= lowerUs, "upper bound below lower bound")
    val l = left.withWatermark(ts, lateness)
    val r = right
      .select(Seq(col(key).as("_rk"), col(ts).as("_rts")) ++
        rightPayload.map(col): _*)
      .withWatermark("_rts", lateness)
    // the range condition must stay on the raw event-time columns —
    // wrapping them (unix_micros etc.) would hide the bound from the
    // engine's state-watermark derivation and buffer both sides forever
    l.join(r, col(key) === col("_rk") &&
        col("_rts") >= col(ts) + expr(s"INTERVAL '$lowerUs' MICROSECOND") &&
        col("_rts") <= col(ts) + expr(s"INTERVAL '$upperUs' MICROSECOND"))
      .drop("_rk", "_rts")
  }
}
