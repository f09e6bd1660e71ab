package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** Streaming twin of q38's SimHash block dedup — the 28th incremental
  * twin, and the first whose PAIR SET reproduces its batch query
  * exactly, arrival-order-independently: the 4×16-bit block index
  * (lossless for hamming <= 3 by pigeonhole) lives in keyed streaming
  * state, and each arriving document probes its four block buckets,
  * emits every hamming <= 2 pair against the members already indexed,
  * then joins the bucket. Every unordered pair is found when the LATER
  * of its two docs arrives — whatever the arrival order, whatever the
  * batch boundaries — so the compacted emission equals batch q38
  * row-for-row (IncrementalSimhashBlocksSpec pins it at both gate SFs,
  * shuffled feed order included).
  *
  * The rank-window screens (q121/q260) cannot have such a twin — a
  * GLOBAL sort order changes as documents arrive — which is exactly
  * why the block index is the streaming-side member of the simhash
  * family. Distribution matches the batch join: state shards on the
  * (block_no, block_value) key like the batch bucket shuffle; a pair
  * sharing several blocks is emitted by each shared bucket and the
  * sink compaction (max over the constant hamming) absorbs both that
  * and at-least-once replays — the monotone-per-key doctrine.
  * Fingerprints come from the scalar [[graft.plans.SimHashText]]
  * (byte-identical to the batch SimHashAgg feed), bit-packed to two
  * longs so the probe is two bit_count(xor) ops per comparison, the
  * q38 convention. Hot buckets carry the same skew exposure as the
  * batch join's hot blocks. */
object IncrementalSimhashBlocks {

  /** One block-bucket membership: key = "<j>:<16-bit block>", with the
    * doc's full packed fingerprint for the hamming check. */
  case class Member(key: String, docId: Long, h1: Long, h2: Long)

  case class BlockPair(aId: Long, bId: Long, hamming: Long)

  /** Explode (doc_id, text) into its four block-keyed evidence rows —
    * stateless projection, applies to streaming inputs unchanged. */
  def evidence(docs: DataFrame): Dataset[Member] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long").as("docId"),
        graft.plans.SimHashText(col("text")).as("fp"))
      .select(col("docId"),
        expr("CAST(conv(substring(fp, 1, 32), 2, 10) AS BIGINT)").as("h1"),
        expr("CAST(conv(substring(fp, 33, 32), 2, 10) AS BIGINT)").as("h2"),
        posexplode(expr(
          "transform(sequence(0, 3), j -> substring(fp, 16*j+1, 16))"))
          .as(Seq("j", "blk")))
      .select(concat(col("j"), lit(":"), col("blk")).as("key"),
        col("docId"), col("h1"), col("h2"))
      .as[Member]
  }

  /** Compact the at-least-once pair emissions (multi-block duplicates,
    * replays) to the canonical pair set — usable on the sink table or
    * in foreachBatch. hamming is a pure function of the pair, so max
    * is both idempotent and exact. */
  def compact(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("aId").as("a_id"), col("bId").as("b_id"))
      .agg(max(col("hamming")).as("hamming"))
}

/** Keyed state: the bucket's members as packed (docId, h1, h2) triples.
  * Top-level class so the closure serializes without a spec/session
  * reference. */
class SimhashBlockProcessor extends StatefulProcessor[
    String, IncrementalSimhashBlocks.Member,
    IncrementalSimhashBlocks.BlockPair] {
  import IncrementalSimhashBlocks.{BlockPair, Member}

  @transient private var members: ListState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    members = getHandle.getListState[(Long, Long, Long)]("members",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[Member],
      timerValues: TimerValues): Iterator[BlockPair] = {
    // snapshot once, then extend locally: several docs of one bucket in
    // one micro-batch must still pair with each other, in feed order
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    members.get().foreach(buf += _)
    rows.flatMap { r =>
      val hits = buf.iterator
        // a replayed doc must not pair with its own stale entry
        .filter(_._1 != r.docId)
        .flatMap { case (id, h1, h2) =>
          val d = java.lang.Long.bitCount(h1 ^ r.h1) +
            java.lang.Long.bitCount(h2 ^ r.h2)
          if (d <= 2)
            Iterator.single(BlockPair(math.min(id, r.docId),
              math.max(id, r.docId), d.toLong))
          else Iterator.empty
        }.toVector
      buf += ((r.docId, r.h1, r.h2))
      members.appendValue((r.docId, r.h1, r.h2))
      hits
    }
  }
}
