package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

import graft.queries.Dedup.{B, K}

/** Streaming twin of q80's incremental-ingest dedup: the corpus's exact
  * fingerprints and MinHash band index live in KEYED STREAMING STATE, and
  * new documents are classified `exact_dup` / `near_dup` / `new` as they
  * arrive — the reference's stateful-keyed-streaming identity
  * (`StreamGroupedReduce.java:35-55` generalized to user state, SURVEY
  * §2.3/§2.6) fused with the dedup north star.
  *
  * Distribution is the same as the batch band join: evidence rows are
  * keyed by band hash (and by content fingerprint for the exact check),
  * so state shards across executors exactly like the asymmetric band join
  * shards its shuffle — per-ingest cost scales with the BATCH, corpus
  * state is only ever touched at the keys the batch actually probes. The
  * state layout is the production shape: the corpus-side band index a
  * pipeline would keep materialized between ingests, here owned by the
  * engine's state store (RocksDB-capable, checkpoint-recoverable).
  *
  * Semantics match q80 exactly (IncrementalDedupSpec asserts
  * verdict-equality): a probe is `exact_dup` if its normalized-content
  * md5 is in corpus state, else `near_dup` if it shares any of the B=4
  * MinHash bands with a corpus doc agreeing on >= 8/16 signature slots,
  * else `new`. Rows carry an `admit` flag: admitted docs update state
  * (backfill / accepted ingest), non-admitted docs are classified only —
  * q80's corpus-vs-batch asymmetry. Admissions become visible to probes
  * in FOLLOWING micro-batches (within one batch, per-key arrival order
  * decides — feed corpus and ingest as separate batches, as q80 does).
  */
object IncrementalDedup {

  /** One unit of dedup evidence: an exact-fp key (`e:<md5>`) or a band
    * key (`b:<j>:<bandhash>`) with the doc's full signature for slot
    * agreement. `sig` rides joined as one string (state-encoder-simple). */
  case class Evidence(key: String, docId: Long, sig: String, admit: Boolean)

  /** Classification evidence for one probe doc: 2 = exact fingerprint
    * hit, 1 = band hit with >= 8/16 slot agreement (0 is never emitted;
    * the fp row emits hit=0 as the doc's presence marker). */
  case class Hit(docId: Long, hit: Int)

  /** Explode (doc_id, text, admit) into keyed evidence rows: one exact-fp
    * row per doc + one row per MinHash band (docs with < 3 words have no
    * shingles, hence no bands — exact check only, as in q80). Stateless
    * projection on the native WordShingles/MinHashSig expressions, so it
    * applies to streaming inputs unchanged. */
  def evidence(docs: DataFrame): Dataset[Evidence] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigd = docs.select(
      col("doc_id").cast("long").as("docId"), col("admit"),
      md5(lower(trim(col("text")))).as("fp"),
      graft.plans.WordShingles(col("text"), 3, distinct = true).as("sh"))
      .withColumn("sig",
        when(size(col("sh")) > 0, graft.plans.MinHashSig(col("sh"), K)))
    val exact = sigd.select(
      concat(lit("e:"), col("fp")).as("key"),
      col("docId"), lit("").as("sig"), col("admit"))
    val bandArr = (0 until B).map(j =>
      md5(concat((4 * j until 4 * j + 4).map(i => col("sig").getItem(i)): _*)))
    val bands = sigd.filter(col("sig").isNotNull)
      .select(col("docId"), col("admit"),
        array_join(col("sig"), ",").as("sigj"),
        posexplode(array(bandArr: _*)).as(Seq("j", "bh")))
      .select(concat(lit("b:"), col("j"), lit(":"), col("bh")).as("key"),
        col("docId"), col("sigj").as("sig"), col("admit"))
    exact.unionByName(bands).as[Evidence]
  }

  /** Per-doc verdicts from the processor's hit stream — a stateless
    * per-micro-batch fold (all of a doc's evidence lands in the batch
    * that carried the doc), usable on the sink table or in foreachBatch. */
  def verdicts(hits: DataFrame): DataFrame =
    hits.groupBy(col("docId").as("doc_id"))
      .agg(max(col("hit")).as("h"))
      .select(col("doc_id"),
        when(col("h") === 2, "exact_dup")
          .when(col("h") === 1, "near_dup")
          .otherwise("new").as("status"))
}

/** Keyed state: exact keys hold a seen flag (ValueState), band keys hold
  * the bucket's corpus signatures (ListState — the per-band index). Hot
  * band buckets are the same skew exposure as the batch join's hot
  * bands; a production deployment would cap bucket size the way the
  * batch path caps shingle df (MaxShingleDf). Top-level class so the
  * closure serializes without a spec/session reference. */
class IncrementalDedupProcessor extends StatefulProcessor[
    String, IncrementalDedup.Evidence, IncrementalDedup.Hit] {
  import IncrementalDedup.{Evidence, Hit}

  @transient private var seen: ValueState[Boolean] = _
  @transient private var sigs: ListState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean,
      TTLConfig.NONE)
    sigs = getHandle.getListState[String]("sigs", Encoders.STRING,
      TTLConfig.NONE)
  }

  private def slotsAgree(a: String, b: String): Int = {
    val (x, y) = (a.split(",", -1), b.split(",", -1))
    var i = 0; var n = 0
    while (i < x.length && i < y.length) { if (x(i) == y(i)) n += 1; i += 1 }
    n
  }

  override def handleInputRows(key: String, rows: Iterator[Evidence],
      timerValues: TimerValues): Iterator[Hit] = {
    if (key.startsWith("e:")) rows.flatMap { r =>
      if (r.admit) { seen.update(true); Iterator.empty }
      else Iterator.single(Hit(r.docId, if (seen.exists()) 2 else 0))
    } else rows.flatMap { r =>
      if (r.admit) { sigs.appendValue(r.sig); Iterator.empty }
      else if (sigs.get().exists(s => slotsAgree(s, r.sig) >= 8))
        Iterator.single(Hit(r.docId, 1))
      else Iterator.empty
    }
  }
}
