package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, session_window, window}

/** Windowed aggregation facade ≙ Flink's window operator family, cut from
  * the reference (only `streaming/api/windowing/time/Time.java` survives —
  * SURVEY §2.6) and restored on Structured Streaming's `window` /
  * `session_window` grouping columns.
  *
  * Works identically over bounded frames and unbounded streams (with a
  * watermark on `timeCol` for state cleanup — [[GStream.withWatermark]]).
  * Triggers/evictors have no direct analogue: trigger timing belongs to
  * the sink (`Trigger.ProcessingTime`), late-data policy to the watermark.
  *
  * Scale: windowed aggregation shuffles on (window, keys) with map-side
  * partial aggregation; session windows additionally merge adjacent
  * per-key sessions inside the state store — both bounded-state given a
  * watermark.
  */
object GWindows {
  private def checkAggs(aggs: Seq[Column]): Unit =
    require(aggs.nonEmpty, "GWindows needs at least one aggregation column")

  /** Tumbling windows ≙ TumblingProcessing/EventTimeWindows.of(size). */
  def tumbling(df: DataFrame, timeCol: String, size: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    checkAggs(aggs)
    df.groupBy(window(col(timeCol), size) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Sliding windows ≙ SlidingWindows.of(size, slide). */
  def sliding(df: DataFrame, timeCol: String, size: String, slide: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    checkAggs(aggs)
    df.groupBy(window(col(timeCol), size, slide) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Session windows ≙ EventTimeSessionWindows.withGap(gap). */
  def session(df: DataFrame, timeCol: String, gap: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    checkAggs(aggs)
    df.groupBy(session_window(col(timeCol), gap) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
