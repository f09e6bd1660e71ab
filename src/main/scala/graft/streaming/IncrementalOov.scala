package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of q237's OOV-rate audit — the LIVE vocabulary-
  * coverage monitor: as documents stream in, train-split occurrences
  * (the q56 md5-nibble fence) grow the vocabulary and every occurrence
  * accumulates per-(word, source) counts, so the per-source OOV rate is
  * always current — the alarm that fires when a newly added source
  * starts shipping words the training split has never seen. 26th
  * streaming twin.
  *
  * The subtlety a naive counter misses: a word's OOV status can FLIP —
  * occurrences that arrived before the word's first train-split
  * occurrence were OOV at the time but are NOT in the batch audit of
  * the finished corpus. This twin therefore keys state by the WORD
  * (the [[IncrementalBpe]] histogram shape): per word, a vocabulary
  * bit (monotone false→true on the first train occurrence) and the
  * per-source cumulative count map. Every micro-batch RE-EMITS all
  * (word, source) rows of each touched word with the current flag, so
  * a flip republishes the word's whole row set and the downstream
  * max-compaction ([[report]] — (n, inVocab) is jointly monotone per
  * key, so `max(struct)` is the latest row) converges to EXACTLY the
  * batch q237 report: IncrementalOovSpec pins the final report rows
  * bitwise, whatever the arrival order.
  *
  * Scale: state per word is its source-count map (|sources|-bounded) +
  * one bit; per-batch emission is touched-words × their source fan,
  * never the corpus; nothing corpus-proportional reaches the driver.
  * Math.addExact guards the counters.
  */
object IncrementalOov {

  /** One token occurrence: the word, its document's source, and whether
    * that document sits in the train split (grows the vocabulary). */
  case class Tok(tok: String, source: String, isTrain: Long)

  /** One emitted update: the word's CURRENT cumulative count for one
    * source, stamped with its current vocabulary bit. */
  case class WordCount(tok: String, source: String, n: Long,
      inVocab: Boolean)

  /** Explode a documents frame into token observations — a stateless
    * projection that applies to streaming inputs unchanged. */
  def observations(docs: DataFrame): Dataset[Tok] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("source"),
        (instr(lit("0123456789abcdef"),
          substring(md5(col("doc_id").cast("string")), 1, 1)) - 1).as("nib"),
        explode(split(col("text"), " ")).as("tok"))
      .select(col("tok"), col("source"),
        when(col("nib") <= 12, 1L).otherwise(0L).as("isTrain"))
      .as[Tok]
  }

  /** Compact an emission log into the q237 report: latest row per
    * (word, source) — (n, inVocab) is jointly monotone, so max(struct)
    * — then the per-source rollup in q237's exact ppm arithmetic. */
  def report(emissions: DataFrame): DataFrame = {
    val latest = emissions
      .groupBy(col("tok"), col("source"))
      .agg(max(struct(col("n"), col("inVocab"))).as("s"))
      .select(col("tok"), col("source"),
        col("s.n").as("n"), col("s.inVocab").as("inVocab"))
    latest.groupBy(col("source"))
      .agg(sum(col("n")).as("n_tok"),
        sum(when(!col("inVocab"), col("n")).otherwise(0L)).as("n_oov"),
        countDistinct(when(!col("inVocab"), col("tok")))
          .cast("long").as("n_oov_types"))
      .select(col("source"), col("n_tok"), col("n_oov"),
        expr("""(1000000 * n_oov)
          | div greatest(n_tok, CAST(1 AS BIGINT))"""
          .stripMargin.replace("\n", "")).as("oov_ppm"),
        col("n_oov_types"))
      .orderBy(col("source"))
  }
}

/** Word-keyed vocabulary bit + per-source count map; top-level class so
  * the closure serializes without a spec/session reference. */
class IncrementalOovProcessor extends StatefulProcessor[
    String, IncrementalOov.Tok, IncrementalOov.WordCount] {
  import IncrementalOov.{Tok, WordCount}

  @transient private var inVocab: ValueState[Boolean] = _
  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    inVocab = getHandle.getValueState[Boolean]("inVocab",
      Encoders.scalaBoolean, TTLConfig.NONE)
    counts = getHandle.getMapState[String, Long]("counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[Tok],
      timerValues: TimerValues): Iterator[WordCount] = {
    rows.foreach { t =>
      val cur = if (counts.containsKey(t.source)) counts.getValue(t.source)
        else 0L
      counts.updateValue(t.source, Math.addExact(cur, 1L))
      if (t.isTrain > 0L && !(inVocab.exists() && inVocab.get()))
        inVocab.update(true)
    }
    val v = inVocab.exists() && inVocab.get()
    // re-emit the word's whole row set: a vocabulary flip republishes
    // every source's row with the new bit, keeping max-compaction exact.
    // Materialized BEFORE returning (the IncrementalDrift convention):
    // a state-store iterator consumed lazily after handleInputRows
    // returns is not guaranteed valid on RocksDB.
    counts.iterator().map { case (src, n) =>
      WordCount(key, src, n, v)
    }.toVector.iterator
  }
}
