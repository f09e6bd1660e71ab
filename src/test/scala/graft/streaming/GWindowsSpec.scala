package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** GWindows facade over bounded and unbounded inputs. */
class GWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val batch = Seq(
    (ts("2024-01-01 00:00:10"), "a", 1),
    (ts("2024-01-01 00:00:50"), "a", 2),
    (ts("2024-01-01 00:01:10"), "a", 4),
    (ts("2024-01-01 00:05:00"), "b", 8))

  test("tumbling and sliding windows on a bounded frame") {
    val df = batch.toDF("ts", "k", "v")
    val tumb = GWindows.tumbling(df, "ts", "1 minute", Seq("k"),
      Seq(sum(col("v")).as("s")))
      .select(col("window.start"), col("k"), col("s"))
      .as[(Timestamp, String, Long)].collect().toSet
    assert(tumb == Set(
      (ts("2024-01-01 00:00:00"), "a", 3L),
      (ts("2024-01-01 00:01:00"), "a", 4L),
      (ts("2024-01-01 00:05:00"), "b", 8L)))

    val slid = GWindows.sliding(df, "ts", "2 minutes", "1 minute", Seq("k"),
      Seq(sum(col("v")).as("s")))
      .select(col("window.start"), col("k"), col("s"))
      .as[(Timestamp, String, Long)].collect().toSet
    // each record lands in 2 overlapping windows
    assert(slid.contains((ts("2024-01-01 00:00:00"), "a", 7L)))
    assert(slid.contains((ts("2023-12-31 23:59:00"), "a", 3L)))
  }

  test("session windows close after the gap") {
    val df = batch.toDF("ts", "k", "v")
    val sess = GWindows.session(df, "ts", "1 minute", Seq("k"),
      Seq(sum(col("v")).as("s"), count(lit(1)).as("n")))
      .select(col("k"), col("s"), col("n"))
      .as[(String, Long, Long)].collect().toSet
    // a: 00:00:10/00:00:50/00:01:10 chain into one session (gaps < 1 min)
    assert(sess == Set(("a", 7L, 3L), ("b", 8L, 1L)))
  }

  test("streaming session window emits on watermark close") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Int)]
    val agg = GWindows.session(
      in.toDF().toDF("ts", "k", "v").withWatermark("ts", "10 seconds"),
      "ts", "1 minute", Seq("k"), Seq(sum(col("v")).as("s")))
      .select(col("k"), col("s"))
    val q = agg.writeStream.format("memory").queryName("gw_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts("2024-01-01 00:00:10"), "a", 1),
        (ts("2024-01-01 00:00:40"), "a", 2))
      q.processAllAvailable()
      // advance watermark far past the session gap -> session closes
      in.addData((ts("2024-01-01 00:10:00"), "z", 0))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:20:00"), "z2", 0))
      q.processAllAvailable()
      val rows = spark.table("gw_out").as[(String, Long)].collect().toSet
      assert(rows.contains(("a", 3L)))
    } finally q.stop()
  }
}
