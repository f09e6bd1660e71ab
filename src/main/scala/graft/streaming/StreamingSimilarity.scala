package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

import graft.functions.Vectors
import graft.queries.Similarity.{SrpBits, SrpTables}

/** Streaming twin of q41's SRP-LSH similarity search — the ONLINE
  * retrieval shape: the corpus's LSH band index lives in KEYED STREAMING
  * STATE, and arriving query vectors get their same-bucket candidates
  * scored against indexed state as they arrive. Third continuous
  * operator next to [[IncrementalDedup]] (whose state layout this
  * mirrors) and [[IncrementalKMeans]] — the reference's stateful keyed
  * streaming identity (`StreamGroupedReduce.java:35-55` generalized to
  * user state, SURVEY §2.3/§2.6) fused with the ANN north star.
  *
  * Distribution is the same as the batch LSH join: evidence rows are
  * keyed by (table, bucket), so the index shards across executors
  * exactly like q41's band join shards its shuffle — a query probes ONLY
  * the L buckets it hashes to, never the corpus; per-probe cost scales
  * with bucket occupancy (the LSH guarantee), and corpus state is owned
  * by the engine's state store (RocksDB-capable, checkpoint-
  * recoverable). Hot buckets are the same skew exposure as the batch
  * join's hot bands; a production deployment would cap bucket size the
  * way the batch path caps shingle df (MaxShingleDf).
  *
  * Scoring is bit-exact vs batch q41 (StreamingSimilaritySpec asserts
  * top-k equality): bucket bits come from the SAME srpBit column
  * expressions, and the cosine is [[Vectors.dotJvm]] — the same
  * left-to-right double fold as the codegen'd DotProduct — over the
  * same float arrays, so even the double scores agree exactly. A pair
  * colliding in several tables emits bit-identical candidates from each
  * bucket's state; the consumer collapses them with DISTINCT exactly
  * like the batch plan. Admitted vectors become visible to probes in
  * FOLLOWING micro-batches (the [[IncrementalDedup]] contract: feed
  * corpus and queries as separate batches).
  */
object StreamingSimilarity {

  /** One unit of index/probe evidence: the vector exploded to one row
    * per SRP table, keyed `<table>:<bucket>`. `admit` = index it
    * (corpus side) vs probe it (query side). */
  case class Evidence(key: String, vecId: Long, emb: Array[Float],
      admit: Boolean)

  /** An indexed corpus vector inside one bucket's state. */
  case class IndexedVec(vecId: Long, emb: Array[Float])

  /** A scored same-bucket candidate pair (pre-DISTINCT, pre-top-k —
    * the streaming analogue of q41's `cand` stage). */
  case class Cand(qId: Long, nbId: Long, cos: Double)

  /** Explode (vec_id, embedding, admit) into keyed evidence rows — one
    * per SRP table, bucket bits from the SAME [[Vectors.srpBit]]
    * expressions as batch q41. Stateless projection, applies to
    * streaming inputs unchanged. */
  def evidence(vecs: DataFrame): Dataset[Evidence] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val tables = (0 until SrpTables).map(t =>
      concat((SrpBits * t until SrpBits * t + SrpBits)
        .map(j => Vectors.srpBit("embedding", j).cast("string")): _*))
    vecs.select(col("vec_id").cast("long").as("vecId"),
        col("embedding"), col("admit"),
        posexplode(array(tables: _*)).as(Seq("j", "bkt")))
      .select(concat(col("j"), lit(":"), col("bkt")).as("key"),
        col("vecId"), col("embedding").as("emb"), col("admit"))
      .as[Evidence]
  }

  /** Exact cosine, bit-identical to the batch plan's
    * `DotProduct(qe, ce) / (qn * cn)`: same fold order, sqrt is
    * IEEE-correctly rounded, one multiply and one divide. */
  private[streaming] def cosine(a: Array[Float], b: Array[Float]): Double =
    Vectors.dotJvm(a, b) /
      (math.sqrt(Vectors.dotJvm(a, a)) * math.sqrt(Vectors.dotJvm(b, b)))
}

/** Keyed state: each (table, bucket) key holds the bucket's indexed
  * corpus vectors (ListState — the per-bucket inverted index). Top-level
  * class so the closure serializes without a spec/session reference. */
class StreamingSimilarityProcessor extends StatefulProcessor[
    String, StreamingSimilarity.Evidence, StreamingSimilarity.Cand] {
  import StreamingSimilarity.{Cand, Evidence, IndexedVec, cosine}

  @transient private var bucket: ListState[IndexedVec] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    bucket = getHandle.getListState[IndexedVec]("bucket",
      Encoders.product[IndexedVec], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[Evidence],
      timerValues: TimerValues): Iterator[Cand] =
    rows.flatMap { r =>
      if (r.admit) { bucket.appendValue(IndexedVec(r.vecId, r.emb)); Nil }
      else bucket.get().flatMap { iv =>
        if (iv.vecId == r.vecId) None
        else Some(Cand(r.vecId, iv.vecId, cosine(r.emb, iv.emb)))
      }
    }
}
