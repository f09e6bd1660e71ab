package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Streaming twin of q244's CDC savings report — the chunk-store
  * ADMISSION monitor: as documents stream in, each content-defined
  * chunk (the shared [[graft.queries.Dedup.cdcChunksOf]] projection, so
  * the gate chunks exactly like the batch report) probes a store keyed
  * by (source, chunk hash); the running instance count per key is
  * engine state, and every micro-batch re-emits each touched key's
  * cumulative count — so the per-source dedup savings a chunk store
  * would realize are always current, the way a restic/borg-style
  * backing store decides at WRITE time whether bytes are new. 27th
  * streaming twin.
  *
  * Counts are monotone per key, so the downstream compaction
  * ([[report]] — max per (source, h)) converges to EXACTLY batch
  * q244's per-source rows: IncrementalCdcStoreSpec pins the final
  * report bitwise, whatever the arrival order. A chunk's length rides
  * the emission (identical for identical content — same md5 key ⇒
  * same bytes), so n_chars folds without re-reading any document.
  *
  * Scale: state per key is two longs; per-batch emission is
  * touched-keys-sized; the chunk projection itself is the batch
  * query's stateless scan-stage work. Math.addExact guards the
  * counter.
  */
object IncrementalCdcStore {

  /** One chunk instance arriving at the store. */
  case class Chunk(source: String, h: String, clen: Long)

  /** One emitted update: the key's CURRENT cumulative instance count. */
  case class ChunkCount(source: String, h: String, n: Long, clen: Long)

  /** Explode a documents frame into chunk observations — the shared
    * batch projection (>= 0-length chunks, q244's exact grain),
    * stateless so it applies to streaming inputs unchanged. */
  def observations(docs: DataFrame): Dataset[Chunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.queries.Dedup.cdcChunksOf(docs)
      // the keyed state below joins source and hash with '|' — a source
      // containing the separator would silently mis-attribute chunks in
      // the report, so it must fail loud at the observation grain
      .select(
        when(col("source").contains("|"),
          raise_error(concat(lit("'|' in source name: "), col("source")))
            .cast("string"))
          .otherwise(col("source")).as("source"),
        col("h"), col("clen"))
      .as[Chunk]
  }

  /** Compact an emission log into q244's report: latest count per
    * (source, h) — counts are monotone, so max — then the per-source
    * savings rollup in q244's exact ppm arithmetic. */
  def report(emissions: DataFrame): DataFrame = {
    val latest = emissions
      .groupBy(col("source"), col("h"))
      .agg(max(col("n")).as("n"), max(col("clen")).as("clen"))
    latest.groupBy(col("source"))
      .agg(sum(col("n")).as("n_chunks"),
        count(lit(1)).cast("long").as("n_unique"),
        sum(col("n") * col("clen")).as("n_chars"))
      .select(col("source"), col("n_chunks"), col("n_unique"),
        col("n_chars"),
        expr("(1000000 * (n_chunks - n_unique)) div n_chunks")
          .as("dup_ppm"))
      .orderBy(col("source"))
  }
}

/** (source, chunk-hash)-keyed instance counter; top-level class so the
  * closure serializes without a spec/session reference. */
class IncrementalCdcStoreProcessor extends StatefulProcessor[
    String, IncrementalCdcStore.Chunk, IncrementalCdcStore.ChunkCount] {
  import IncrementalCdcStore.{Chunk, ChunkCount}

  @transient private var st: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)]("count",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[Chunk],
      timerValues: TimerValues): Iterator[ChunkCount] = {
    var (n, clen) = if (st.exists()) st.get() else (0L, 0L)
    rows.foreach { c =>
      n = Math.addExact(n, 1L)
      clen = c.clen
    }
    st.update((n, clen))
    // key = source + "|" + md5 hex; observations() asserts sources are
    // '|'-free before keying, so the first bar IS the separator — but a
    // malformed key must fail loud, not mis-attribute the chunk
    val bar = key.indexOf('|')
    require(bar >= 0, s"malformed chunk key (no '|' separator): $key")
    Iterator.single(ChunkCount(key.substring(0, bar),
      key.substring(bar + 1), n, clen))
  }
}
