package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Streaming twin of q227's precision/recall curve — the LIVE operating-
  * point monitor: the batch curve picks the score thresholds offline
  * (data-derived quartiles over the finished corpus), and this monitor
  * then tracks precision/recall/F1 AT those pinned thresholds as fresh
  * documents stream in — the alarm a curation pipeline keeps on its
  * quality gate to catch the moment an upstream shift moves the
  * classifier off its audited operating point (the q128-drift posture,
  * pointed at the classifier instead of the data). 25th streaming twin.
  *
  * Input is each doc's (si, heur) — the q227 surface via
  * [[graft.queries.TextOps.scoredDocs]], ONE shared definition so the
  * monitor and the batch curve can never disagree on what is graded —
  * exploded once per threshold and keyed by the threshold id, so the
  * per-key state is three BIGINT counters (n_pos, n_pred, tp) whatever
  * the corpus size, sharded across the state store by threshold. Every
  * micro-batch emits each touched threshold's CURRENT confusion counts
  * and precision/recall/F1 in exact ppm — q227's integer arithmetic
  * verbatim ((1e6·tp) div max(n_pred,1), harmonic mean as
  * (2·P·R) div (P+R) on the ppm values), so
  * IncrementalClassifierPrSpec pins the final emission bitwise against
  * the batch query's rows at the same thresholds.
  *
  * Scale: per-doc work is the scoredDocs projection plus a
  * |thresholds|-bounded fan-out (q227's own broadcast shape); state is
  * 3 longs per threshold; nothing corpus-proportional accumulates
  * anywhere. Math.addExact guards the counters (the IncrementalDrift
  * overflow posture).
  */
object IncrementalClassifierPr {

  /** One doc's contribution to one threshold's counters. */
  case class PrObs(q: Long, si: Long, heur: Long)

  /** A threshold's current operating point (exact counts + ppm). */
  case class PrPoint(q: Long, thrSi: Long, nPos: Long, nPred: Long,
      tp: Long, precisionPpm: Long, recallPpm: Long, f1Ppm: Long)

  private[streaming] case class Counts(nPos: Long, nPred: Long, tp: Long)

  /** Explode a documents frame into per-threshold observations —
    * scoredDocs × |thresholds|, a stateless projection that applies to
    * streaming inputs unchanged. */
  def observations(docs: DataFrame,
      thresholds: Map[Long, Long]): Dataset[PrObs] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qs = array(thresholds.keys.toSeq.sorted.map(lit): _*)
    graft.queries.TextOps.scoredDocs(docs)
      .select(col("si"), col("heur"), explode(qs).as("q"))
      .select(col("q"), col("si"), col("heur"))
      .as[PrObs]
  }
}

/** Keyed counter store + operating-point emission; top-level class so
  * the closure serializes without a spec/session reference. The
  * threshold map (quartile id -> score cut) rides the constructor —
  * |thresholds|-sized, the batch curve's output. */
class IncrementalClassifierPrProcessor(thresholds: Map[Long, Long])
    extends StatefulProcessor[Long, IncrementalClassifierPr.PrObs,
      IncrementalClassifierPr.PrPoint] {
  import IncrementalClassifierPr.{Counts, PrObs, PrPoint}

  @transient private var st: ValueState[Counts] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Counts]("counts",
      Encoders.product[Counts], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[PrObs],
      timerValues: TimerValues): Iterator[PrPoint] = {
    val thr = thresholds.getOrElse(key,
      throw new IllegalArgumentException(
        s"IncrementalClassifierPr: unknown threshold id $key " +
          s"(configured: ${thresholds.keys.toSeq.sorted.mkString(",")})"))
    var c = if (st.exists()) st.get() else Counts(0L, 0L, 0L)
    rows.foreach { o =>
      val pred = if (o.si >= thr) 1L else 0L
      c = Counts(
        Math.addExact(c.nPos, o.heur),
        Math.addExact(c.nPred, pred),
        Math.addExact(c.tp, pred * o.heur))
    }
    st.update(c)
    val p = (1000000L * c.tp) / Math.max(c.nPred, 1L)
    val r = (1000000L * c.tp) / Math.max(c.nPos, 1L)
    val f1 = (2L * p * r) / Math.max(p + r, 1L)
    Iterator.single(PrPoint(key, thr, c.nPos, c.nPred, c.tp, p, r, f1))
  }
}
