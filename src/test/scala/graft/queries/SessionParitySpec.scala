package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.GWindows

/** The two sessionization formulations must cut identical sessions:
  * q76's gaps-and-islands (lag + running sum — the batch/backfill
  * form) and `session_window` (the engine's native session merge, q28 /
  * GWindows.session). Checked per user on the real corpus: same session
  * count, same (start, end, n_events) multiset. A drift here would mean
  * backfilled history and live streaming disagree on session
  * boundaries — the classic lambda-architecture bug this pairing
  * exists to prevent. */
class SessionParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("gaps-and-islands sessions == session_window sessions") {
    val viaIslands = graft.SparkEntry
      .queries("q76_sessionize")(spark, dir)
      .select(col("user_id"), col("start_ts"), col("end_ts"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3))).toSet

    val ev = graft.sources.Tables(spark, dir, "events")
    val viaEngine = GWindows.session(ev, "ts", "30 minutes",
        Seq("user_id"),
        Seq(count(lit(1)).as("n_events"),
          min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts")))
      .select(col("user_id"), col("start_ts"), col("end_ts"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3))).toSet

    assert(viaIslands.nonEmpty)
    assert(viaIslands == viaEngine)
  }
}
