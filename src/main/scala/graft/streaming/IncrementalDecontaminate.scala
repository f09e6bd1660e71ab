package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming decontamination — the twin of batch q218/q63: flag each
  * TRAINING document, as it arrives, against the benchmark/eval grams
  * seen SO FAR (decontaminate-on-ingest — the gate a scraping pipeline
  * runs before a document ever reaches a training shard, instead of
  * the post-hoc batch report). The gram set is KEYED EXECUTOR STATE
  * (`transformWithState` keyed by the 8-gram itself, ValueState marking
  * membership in the test split — the IncrementalDedup seen-keys shape),
  * so the state shards with the gram space and nothing
  * corpus-proportional exists anywhere:
  *
  *  - every document explodes DISTRIBUTED into its distinct 8-grams
  *    ([[grams]] — one row per (role, doc, gram); text never leaves the
  *    executors), carrying its q56-nibble role: test docs ADD grams,
  *    train docs PROBE them;
  *  - per gram key and batch, the processor folds test rows FIRST (so a
  *    train doc and the test gram that contaminates it may share a
  *    batch — arrival order within a batch is not load-bearing), then
  *    emits one [[Hit]] per train probe that finds the gram present;
  *  - [[report]] compacts an accumulated hit stream to q218's surface:
  *    (train_id, n_shared) by count-distinct — a train doc's grams all
  *    travel in its own batch, so its row in the report is complete the
  *    moment its batch commits.
  *
  * SEMANTICS vs batch: the stream can only know the eval set seen so
  * far, so a train doc preceding its contaminating test doc is NOT
  * flagged — by design (the spec pins the equality once every test doc
  * has arrived first, and the single-batch run against batch q218
  * itself). Restart recovery is the ENGINE's (RocksDB-exercised).
  *
  * Reference for the operator surface (not the algorithm):
  * min-flink KeyedStream.java:206-209 (keyed running state).
  */
object IncrementalDecontaminate {

  /** One (role, doc, gram) row: `test` = true adds the gram to the
    * blocklist state, false probes it. */
  case class GramEvent(g: String, test: Boolean, doc_id: Long)

  /** One flagged (train doc, gram) contamination hit. */
  case class Hit(train_id: Long, g: String)

  /** Distributed explode of a document frame into per-role distinct
    * 8-gram events — q218's split convention (q56 md5 nibble: test
    * >= 14, train <= 12; the 13-nibble validation slice is neither).
    * Reusable on a static OR streaming frame. */
  def grams(docs: DataFrame, idCol: String, textCol: String)
      : Dataset[GramEvent] = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(col(idCol).as("doc_id"),
        (instr(lit("0123456789abcdef"),
          substring(md5(col(idCol).cast("string")), 1, 1)) - 1).as("nib"),
        explode(graft.plans.WordShingles(col(textCol), 8, distinct = true))
          .as("g"))
      .filter(col("nib") <= 12 || col("nib") >= 14)
      .select(col("g"), (col("nib") >= 14).as("test"), col("doc_id"))
      .as[GramEvent]
  }

  /** The running gate: keyed state by gram, one emitted [[Hit]] per
    * train probe finding its gram in the seen-so-far test set. */
  def hits(events: Dataset[GramEvent]): Dataset[Hit] = {
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_.g)
      .transformWithState(new DecontaminateProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** Compact an accumulated hit stream to q218's report surface:
    * (train_id, n_shared). Grams are distinct per document by
    * construction, so count-distinct guards only against replayed
    * batches. */
  def report(hitFrame: DataFrame): DataFrame =
    hitFrame.groupBy(col("train_id"))
      .agg(countDistinct(col("g")).as("n_shared"))
}

/** Keyed gram-membership state machine; top-level so the closure
  * serializes without a spec/session reference. State schema: one
  * ValueState column family "t" (gram is in the test split) —
  * append-only per the OverlapProcessor compatibility doctrine. */
class DecontaminateProcessor extends StatefulProcessor[
    String, IncrementalDecontaminate.GramEvent,
    IncrementalDecontaminate.Hit] {
  import IncrementalDecontaminate.{GramEvent, Hit}

  @transient private var t: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    t = getHandle.getValueState[Boolean]("t", Encoders.scalaBoolean,
      TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[GramEvent],
      timerValues: TimerValues): Iterator[Hit] = {
    // fold test arrivals before train probes: same-batch contamination
    // must flag regardless of the iterator's physical order
    val probes = scala.collection.mutable.ArrayBuffer.empty[Long]
    var present = t.exists() && t.get()
    rows.foreach { e =>
      if (e.test) present = true else probes += e.doc_id
    }
    if (present && !(t.exists() && t.get())) t.update(true)
    if (present) probes.distinct.iterator.map(Hit(_, key))
    else Iterator.empty
  }
}
