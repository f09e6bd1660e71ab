package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Capability-class streaming restorations (SURVEY §2.7): event-time
  * tumbling windows with watermark-based late-data drop — cut from the
  * reference (only the `Time` helper file remains, SURVEY §2.6) and
  * restored via Structured Streaming built-ins.
  */
class WindowingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("event-time tumbling window aggregates by window, drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Int)]
    val agg = in.toDF().toDF("ts", "k", "v")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"), col("k"))
      .agg(sum(col("v")).as("s"))
      .select(col("window.start").as("w"), col("k"), col("s"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts("2024-01-01 00:00:05"), "a", 1),
        (ts("2024-01-01 00:00:40"), "a", 2))
      q.processAllAvailable()
      // advance watermark beyond 00:01:00 + 10s so the first window closes
      in.addData((ts("2024-01-01 00:02:00"), "a", 5))
      q.processAllAvailable()
      // this record is behind the watermark -> dropped
      in.addData((ts("2024-01-01 00:00:50"), "a", 100))
      q.processAllAvailable()
      // close remaining windows
      in.addData((ts("2024-01-01 00:10:00"), "a", 7))
      q.processAllAvailable()
      val rows = spark.table("win_out").as[(Timestamp, String, Long)]
        .collect().toSet
      assert(rows.contains((ts("2024-01-01 00:00:00"), "a", 3L))) // 1+2, no 100
      assert(rows.contains((ts("2024-01-01 00:02:00"), "a", 5L)))
      assert(!rows.exists(_._3 == 103L))
    } finally q.stop()
  }

  test("stream-stream inner join on key within watermark bounds") {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[(Timestamp, String, Int)]
    val r = MemoryStream[(Timestamp, String, String)]
    val ld = l.toDF().toDF("lts", "k", "v").withWatermark("lts", "10 seconds")
    val rd = r.toDF().toDF("rts", "rk", "tag").withWatermark("rts", "10 seconds")
    val j = ld.join(rd, expr(
      "k = rk AND rts BETWEEN lts - INTERVAL 30 SECONDS AND lts + INTERVAL 30 SECONDS"))
      .select(col("k"), col("v"), col("tag"))
    val q = j.writeStream.format("memory").queryName("join_out")
      .outputMode(OutputMode.Append).start()
    try {
      l.addData((ts("2024-01-01 00:00:10"), "a", 1))
      r.addData((ts("2024-01-01 00:00:20"), "a", "hit"))
      r.addData((ts("2024-01-01 00:05:00"), "a", "far")) // outside range
      q.processAllAvailable()
      val rows = spark.table("join_out").as[(String, Int, String)]
        .collect().toSet
      assert(rows == Set(("a", 1, "hit")))
    } finally q.stop()
  }
}
