package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.{SparkEntry, SparkSpec}

/** Top-level so the Dataset encoder needs no outer scope. */
case class SessEv(user_id: Long, tsMicros: Long)

/** The sessionization twin against batch q76: the same session set must
  * come out of (a) the operator applied to the batch frame, (b) the
  * stream fed in time-sliced batches under a zero watermark delay, and
  * (c) the stream fed fully out of order under a horizon that covers the
  * disorder — plus the lateness contract's negative face: a
  * beyond-horizon event is dropped before the state store. */
class IncrementalSessionsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def events() =
    graft.sources.Tables(spark, dir, "events")
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[SessEv].collect().toSeq

  /** q76's sessions as (user, startMicros, endMicros, n, durationUs). */
  private def want(): Set[(Long, Long, Long, Long, Long)] =
    SparkEntry.queries("q76_sessionize")(spark, dir)
      .select(col("user_id"), unix_micros(col("start_ts")),
        unix_micros(col("end_ts")), col("n_events"), col("duration_us"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  private def toFrame(ds: org.apache.spark.sql.Dataset[SessEv]) =
    ds.select(col("user_id"), timestamp_micros(col("tsMicros")).as("ts"))

  private def gather(table: String): Set[(Long, Long, Long, Long, Long)] =
    spark.table(table)
      .select(col("user_id"), unix_micros(col("start_ts")),
        unix_micros(col("end_ts")), col("n_events"), col("duration_us"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("batch-mode operator equals q76 row-for-row") {
    val got = IncrementalSessions
      .sessions(toFrame(events().toDS()), lateness = "0 seconds")
      .select(col("user_id"), unix_micros(col("start_ts")),
        unix_micros(col("end_ts")), col("n_events"), col("duration_us"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want(), "batch session_window diverged from q76")
  }

  test("time-sliced stream closes every session identically to q76") {
    implicit val sqlCtx = spark.sqlContext
    val all = events().sortBy(_.tsMicros)
    val maxTs = all.map(_.tsMicros).max
    // three time slices in event-time order + a far-future sentinel that
    // pushes the watermark past every real session's close
    val cuts = Seq(all.size / 3, 2 * all.size / 3, all.size)
    val slices = (Seq(0) ++ cuts).sliding(2)
      .map { case Seq(a, b) => all.slice(a, b) }.toSeq :+
      Seq(SessEv(-1L, maxTs + 366L * 86400L * 1000000L))
    val in = MemoryStream[SessEv]
    val q = IncrementalSessions.sessions(toFrame(in.toDS()), lateness = "0 seconds")
      .writeStream.format("memory").queryName("sess_sliced")
      .outputMode(OutputMode.Append).start()
    try slices.foreach { s => in.addData(s); q.processAllAvailable() }
    finally q.stop()
    val got = gather("sess_sliced").filter(_._1 != -1L)
    assert(got == want(), "time-sliced streaming diverged from q76")
  }

  test("disordered stream under a covering horizon still equals q76") {
    implicit val sqlCtx = spark.sqlContext
    val all = events()
    val maxTs = all.map(_.tsMicros).max
    // interleave by tsMicros mod 4: arrival order scrambles both within
    // and across sessions; the horizon covers the full corpus span so
    // late rows must MERGE (or bridge) sessions, never drop. The flush
    // sentinel must outrun the horizon ITSELF for the watermark to pass
    // any real session's close.
    val batches = (0 until 4).map(i => all.filter(_.tsMicros % 4 == i)) :+
      Seq(SessEv(-1L, maxTs + (3650L + 2L) * 86400L * 1000000L))
    val in = MemoryStream[SessEv]
    val q = IncrementalSessions
      .sessions(toFrame(in.toDS()), lateness = "3650 days")
      .writeStream.format("memory").queryName("sess_disorder")
      .outputMode(OutputMode.Append).start()
    try batches.foreach { b => in.addData(b); q.processAllAvailable() }
    finally q.stop()
    val got = gather("sess_disorder").filter(_._1 != -1L)
    assert(got == want(), "disordered streaming diverged from q76")
  }

  test("a beyond-horizon event is dropped, not absorbed") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000000L
    val in = MemoryStream[SessEv]
    val q = IncrementalSessions.sessions(toFrame(in.toDS()), lateness = "0 seconds")
      .writeStream.format("memory").queryName("sess_late")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Seq(SessEv(1, base))); q.processAllAvailable()
      // watermark is now `base`; this event closed the only session a
      // later on-time row could extend
      in.addData(Seq(SessEv(1, base + 7200L * 1000000L)))
      q.processAllAvailable()
      // beyond-horizon: two hours before the watermark — must vanish
      in.addData(Seq(SessEv(1, base - 1L))); q.processAllAvailable()
      in.addData(Seq(SessEv(1, base + 999999L * 1000000L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = gather("sess_late")
    assert(got.forall(_._4 == 1L),
      s"the dropped event must not have joined any session: $got")
    assert(got.size == 2, s"expected exactly the two closed sessions: $got")
  }
}
