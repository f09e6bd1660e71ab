package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

import graft.queries.Dedup.{B, K}

/** Streaming twin of q224's cluster-aware split — SPLIT-ON-INGEST: every
  * arriving document receives its train/val/test assignment at ADMISSION
  * time, and a document that duplicates or near-duplicates an
  * already-admitted one ADOPTS that document's split, so two linked docs
  * can never straddle the train/test fence no matter when each arrived.
  * This is the admission-gate half of the q224 batch report, the way
  * [[IncrementalDecontaminate]] is q218's: the batch query audits a
  * finished corpus; this keeps the invariant true continuously.
  *
  * State layout is [[IncrementalDedup]]'s index with splits as payload:
  * exact-fp keys hold the admitted doc's split (ValueState), MinHash band
  * keys hold (split, signature) entries (ListState) — sharded by the
  * engine's state store exactly like the batch band join shards its
  * shuffle, RocksDB-capable, checkpoint-recoverable. Per-ingest cost
  * scales with the batch: a probe touches only the keys it hashes to.
  *
  * The protocol is PROBE → ASSIGN → ADMIT per ingest batch (the
  * IncrementalDedup corpus-vs-batch contract made explicit): probe rows
  * (admit = false) emit one candidate per index hit — the stored split of
  * every exact-fp match and of every band match agreeing on >= 8/16
  * signature slots; [[assignSplits]] then resolves the batch's INTERNAL
  * links with a batch-local connected-components, folds candidates per
  * group (lexicographically smallest adopted split, else the own-hash
  * split of the group's min-label root — q224's nibble rule) and the
  * caller admits the batch with those final splits. Within a cluster the
  * earliest-arriving group therefore fixes the cluster's split at its
  * root's hash — the seen-so-far contract: batch q224 hashes the final
  * CC root instead, so the two agree on WHICH docs share a split (the
  * leakage invariant, the part that matters) but not necessarily on
  * which split a cluster lands in; IncrementalSplitSpec pins the
  * invariant, both adoption paths, the fallback's q224-rule equality,
  * and ascending-order batching-invariance.
  *
  * Multi-candidate note: a new doc near-dupping two PRIOR docs that were
  * not near-dups of each other can see two different stored splits — a
  * transitive merge batch CC would have folded. The min-split rule makes
  * the outcome deterministic and the doc joins ONE existing group; the
  * previously-admitted docs keep their assignments (admissions are
  * immutable — reassigning shipped training shards is not an operation an
  * ingest gate can perform, which is exactly why the batch report exists
  * for post-hoc audits). */
object IncrementalSplit {

  /** One unit of split evidence: an exact-fp key (`e:<md5>`) or a band
    * key (`b:<j>:<bandhash>`). `split` rides on admit rows (the doc's
    * final assignment); probe rows carry it empty. */
  case class Evidence(key: String, docId: Long, sig: String, admit: Boolean,
      split: String)

  /** One adoption candidate for a probing doc: a stored split this doc's
    * evidence matched in state. */
  case class Cand(docId: Long, split: String)

  /** q224's own-hash rule: md5 nibble of doc_id — <= 11 train,
    * 12–13 val, >= 14 test. */
  def ownSplit(docId: Column): Column = {
    val nib = instr(lit("0123456789abcdef"),
      substring(md5(docId.cast("string")), 1, 1)) - 1
    when(nib <= 11, "train").when(nib <= 13, "val").otherwise("test")
  }

  /** Explode (doc_id, text, admit, split) into keyed evidence rows — the
    * [[IncrementalDedup.evidence]] explode (one exact-fp row per doc +
    * one row per MinHash band; < 3-word docs have no bands) with the
    * split payload threaded through. Stateless projection, applies to
    * streaming inputs unchanged. */
  def evidence(docs: DataFrame): Dataset[Evidence] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigd = docs.select(
      col("doc_id").cast("long").as("docId"), col("admit"), col("split"),
      md5(lower(trim(col("text")))).as("fp"),
      graft.plans.WordShingles(col("text"), 3, distinct = true).as("sh"))
      .withColumn("sig",
        when(size(col("sh")) > 0, graft.plans.MinHashSig(col("sh"), K)))
    val exact = sigd.select(
      concat(lit("e:"), col("fp")).as("key"),
      col("docId"), lit("").as("sig"), col("admit"), col("split"))
    val bandArr = (0 until B).map(j =>
      md5(concat((4 * j until 4 * j + 4).map(i => col("sig").getItem(i)): _*)))
    val bands = sigd.filter(col("sig").isNotNull)
      .select(col("docId"), col("admit"), col("split"),
        array_join(col("sig"), ",").as("sigj"),
        posexplode(array(bandArr: _*)).as(Seq("j", "bh")))
      .select(concat(lit("b:"), col("j"), lit(":"), col("bh")).as("key"),
        col("docId"), col("sigj").as("sig"), col("admit"), col("split"))
    exact.unionByName(bands).as[Evidence]
  }

  /** Fold a probe batch's candidates into final assignments. Two
    * resolution layers, both required for the no-leak invariant:
    *
    *  1. WITHIN-BATCH links — two docs of the SAME probe batch that
    *     duplicate each other have no state entries yet, so they are
    *     grouped by a batch-local connected-components over the batch's
    *     own evidence keys (exact-fp equality; band co-hash with
    *     >= 8/16 slot agreement — the state index's rule verbatim).
    *     Without this, same-batch twins would draw independent own-hash
    *     splits and leak immediately.
    *  2. STATE adoption — each group takes the lexicographically
    *     smallest split any member matched in state; a group with no
    *     state hit falls back to the own-hash split of its GROUP id
    *     (the CC min-label root, = the doc itself for singletons), so
    *     an ascending-order stream assigns exactly what one-doc-per-
    *     batch streaming would (batching invariance, spec-pinned).
    *
    * `probeDocs` must carry (doc_id, text) for every doc of the probe
    * batch. Stateless per-batch fold over batch-sized frames — the CC
    * runs on the batch's internal pairs, never the corpus. */
  def assignSplits(cands: DataFrame, probeDocs: DataFrame): DataFrame = {
    val docs = probeDocs.select(col(probeDocs.columns(0)).as("doc_id"),
      col(probeDocs.columns(1)).as("text"))
    val ev = evidence(docs.select(col("doc_id"), col("text"),
      lit(false).as("admit"), lit("").as("split"))).toDF()
    val agree = expr(
      """aggregate(zip_with(split(xsig, ','), split(ysig, ','),
        | (p, q) -> IF(p = q, 1, 0)), 0, (acc, v) -> acc + v)"""
        .stripMargin.replace("\n", ""))
    val pairs = ev.select(col("key"), col("docId").as("a"),
        col("sig").as("xsig"))
      .join(ev.select(col("key"), col("docId").as("b"),
        col("sig").as("ysig")), "key")
      .filter(col("a") < col("b"))
      .filter(col("key").startsWith("e:") || agree >= 8)
      .select(col("a"), col("b")).distinct()
    val grouped = docs.select(col("doc_id"))
      .join(graft.operators.ConnectedComponents.run(pairs)
        .select(col("node").as("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("grp"))
    val adopted = grouped
      .join(cands.groupBy(col("docId").as("doc_id"))
        .agg(min(col("split")).as("sp")), Seq("doc_id"), "left")
      .groupBy(col("grp"))
      .agg(min(col("sp")).as("adopted")) // min skips nulls; all-null -> null
    grouped.join(adopted, "grp")
      .select(col("doc_id"),
        coalesce(col("adopted"), ownSplit(col("grp"))).as("split"))
  }
}

/** Keyed state: exact keys hold the admitted split (ValueState — first
  * admission wins, deterministic because a later same-fp arrival probes
  * first and adopts the stored value anyway), band keys hold the
  * bucket's (split, signature) entries (ListState). Hot buckets are the
  * batch band join's skew exposure (cap bucket size in production, the
  * MaxShingleDf doctrine). Top-level class so the closure serializes
  * without a spec/session reference. */
class IncrementalSplitProcessor extends StatefulProcessor[
    String, IncrementalSplit.Evidence, IncrementalSplit.Cand] {
  import IncrementalSplit.{Cand, Evidence}

  @transient private var splitSt: ValueState[String] = _
  @transient private var entries: ListState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    splitSt = getHandle.getValueState[String]("split", Encoders.STRING,
      TTLConfig.NONE)
    entries = getHandle.getListState[String]("entries", Encoders.STRING,
      TTLConfig.NONE)
  }

  private def slotsAgree(a: String, b: String): Int = {
    val (x, y) = (a.split(",", -1), b.split(",", -1))
    var i = 0; var n = 0
    while (i < x.length && i < y.length) { if (x(i) == y(i)) n += 1; i += 1 }
    n
  }

  override def handleInputRows(key: String, rows: Iterator[Evidence],
      timerValues: TimerValues): Iterator[Cand] = {
    if (key.startsWith("e:")) rows.flatMap { r =>
      if (r.admit) {
        if (!splitSt.exists()) splitSt.update(r.split)
        Iterator.empty
      } else if (splitSt.exists()) Iterator.single(Cand(r.docId, splitSt.get()))
      else Iterator.empty
    } else rows.flatMap { r =>
      if (r.admit) {
        // '|' never occurs in a split name or the comma-joined sig
        entries.appendValue(r.split + "|" + r.sig)
        Iterator.empty
      } else entries.get().flatMap { e =>
        val cut = e.indexOf('|')
        if (slotsAgree(e.substring(cut + 1), r.sig) >= 8)
          Iterator.single(Cand(r.docId, e.substring(0, cut)))
        else Iterator.empty
      }
    }
  }
}
