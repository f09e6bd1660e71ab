package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.{SparkEntry, SparkSpec}

/** Top-level so the Dataset encoder needs no outer scope. */
case class RjEv(event_id: Long, user_id: Long, tsMicros: Long)

/** The stream-stream range-join twin against batch q58: the same
  * neighbor-pair multiset must come out of (a) the operator applied to
  * batch frames, (b) two MemoryStreams fed in time-sliced event-time
  * order under a zero horizon, and (c) fully disordered feeds under a
  * covering horizon — plus the scale pin: after the watermark passes
  * the corpus, the engine must have EVICTED join state rather than
  * buffering both streams forever. */
class IncrementalRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val W = 15L * 60 * 1000000 // q58's ±15-minute window

  private def events() =
    graft.sources.Tables(spark, dir, "events")
      .select(col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[RjEv].collect().toSeq

  /** q58's ledger answer: event_id -> n_near. */
  private def want(): Map[Long, Long] =
    SparkEntry.queries("q58_range_join")(spark, dir)
      .as[(Long, Long)].collect().toMap

  private def toFrame(ds: org.apache.spark.sql.Dataset[RjEv]) =
    ds.select(col("event_id"), col("user_id"),
      timestamp_micros(col("tsMicros")).as("ts"))

  /** The twin's raw pairs aggregated to q58's shape. */
  private def aggregate(pairs: org.apache.spark.sql.DataFrame) =
    pairs.filter(col("b_id") =!= col("event_id"))

  private def gather(table: String): Map[Long, Long] =
    spark.table(table)
      .filter(col("b_id") =!= col("event_id") && col("event_id") >= 0)
      .groupBy(col("event_id")).agg(count(lit(1)).as("n_near"))
      .as[(Long, Long)].collect().toMap

  test("batch-mode operator equals q58 row-for-row") {
    val ev = toFrame(events().toDS())
    val got = IncrementalRangeJoin.ranged(ev,
        ev.select(col("user_id"), col("ts"), col("event_id").as("b_id")),
        "user_id", "ts", -W, W, "0 seconds", Seq("b_id"))
      .filter(col("b_id") =!= col("event_id"))
      .groupBy(col("event_id")).agg(count(lit(1)).as("n_near"))
      .as[(Long, Long)].collect().toMap
    assert(got == want(), "batch-mode stream-stream join diverged from q58")
  }

  test("time-sliced two-stream feed emits exactly q58's pairs") {
    implicit val sqlCtx = spark.sqlContext
    val all = events().sortBy(_.tsMicros)
    val maxTs = all.map(_.tsMicros).max
    val cuts = Seq(all.size / 3, 2 * all.size / 3, all.size)
    val slices = (Seq(0) ++ cuts).sliding(2)
      .map { case Seq(a, b) => all.slice(a, b) }.toSeq :+
      Seq(RjEv(-1L, -1L, maxTs + 366L * 86400L * 1000000L))
    val inL = MemoryStream[RjEv]
    val inR = MemoryStream[RjEv]
    val joined = IncrementalRangeJoin.ranged(toFrame(inL.toDS()),
      toFrame(inR.toDS())
        .select(col("user_id"), col("ts"), col("event_id").as("b_id")),
      "user_id", "ts", -W, W, "0 seconds", Seq("b_id"))
    val q = joined.writeStream.format("memory").queryName("rj_sliced")
      .outputMode(OutputMode.Append).start()
    try {
      slices.foreach { s =>
        inL.addData(s); inR.addData(s); q.processAllAvailable()
      }
      val got = gather("rj_sliced")
      assert(got == want(), "time-sliced stream-stream join diverged from q58")
      // the scale contract: with the watermark past the corpus, the
      // engine evicted expired join state instead of buffering both
      // streams whole (2·|events| + sentinels would remain otherwise)
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty, "no stateful operator in a stream-stream join?")
      val kept = state.map(_.numRowsTotal).sum
      assert(kept < all.size,
        s"join state kept $kept rows — watermark eviction did not run")
    } finally q.stop()
  }

  test("disordered feeds under a covering horizon still equal q58") {
    implicit val sqlCtx = spark.sqlContext
    val all = events()
    val maxTs = all.map(_.tsMicros).max
    val span = maxTs - all.map(_.tsMicros).min
    // scramble arrival by ts mod 4; the horizon covers the whole span
    val scrambled = all.sortBy(e => (e.tsMicros % 4, e.tsMicros))
    val half = scrambled.size / 2
    val feeds = Seq(scrambled.take(half), scrambled.drop(half),
      Seq(RjEv(-1L, -1L, maxTs + 2 * span + 1)))
    val inL = MemoryStream[RjEv]
    val inR = MemoryStream[RjEv]
    val joined = IncrementalRangeJoin.ranged(toFrame(inL.toDS()),
      toFrame(inR.toDS())
        .select(col("user_id"), col("ts"), col("event_id").as("b_id")),
      "user_id", "ts", -W, W, s"${2 * span} microseconds", Seq("b_id"))
    val q = joined.writeStream.format("memory").queryName("rj_disordered")
      .outputMode(OutputMode.Append).start()
    try {
      feeds.foreach { s =>
        inL.addData(s); inR.addData(s); q.processAllAvailable()
      }
      assert(gather("rj_disordered") == want(),
        "disordered stream-stream join diverged from q58")
    } finally q.stop()
  }
}
