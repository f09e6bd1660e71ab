package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming ingest patterns for a training-data pipeline: stateful
  * streaming dedup (the streaming face of q35) and stream-static dim
  * enrichment (the broadcast-state analogue — SURVEY §2.7 broadcast row).
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming exact dedup drops repeats across microbatches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val deduped = in.toDF().toDF("ts", "fp")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("fp"))
    val q = deduped.writeStream.format("memory").queryName("dd_out")
      .outputMode(OutputMode.Append).start()
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      in.addData((ts("2024-01-01 00:00:01"), "docA"),
        (ts("2024-01-01 00:00:02"), "docB"),
        (ts("2024-01-01 00:00:03"), "docA")) // dup within batch
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:00:04"), "docA")) // dup across batches
      in.addData((ts("2024-01-01 00:00:05"), "docC"))
      q.processAllAvailable()
      val fps = spark.table("dd_out").select("fp").as[String].collect().sorted
      assert(fps.sameElements(Array("docA", "docB", "docC")))
    } finally q.stop()
  }

  test("GStream.deduplicateWithinWatermark: facade routing + batch fallback") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val in = MemoryStream[(Timestamp, String)]
    val out = StreamEnv(spark).fromDataset(in.toDS())
      .withWatermark("_1", "10 minutes")
      .deduplicateWithinWatermark(Seq("_2"))
      .toDataset
    val q = out.writeStream.format("memory").queryName("dd_facade")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts("2024-01-01 00:00:01"), "a"),
        (ts("2024-01-01 00:00:02"), "a"))
      in.addData((ts("2024-01-01 00:00:03"), "a"),
        (ts("2024-01-01 00:00:04"), "b"))
      q.processAllAvailable()
      val got = spark.table("dd_facade").select("_2").as[String]
        .collect().sorted
      assert(got.sameElements(Array("a", "b")))
    } finally q.stop()
    // batch frames take plain dropDuplicates semantics through the
    // same facade call (no watermark machinery to engage)
    val batch = StreamEnv(spark).fromDataset(
        Seq((ts("2024-01-01 00:00:01"), "x"),
          (ts("2024-01-01 00:00:09"), "x")).toDS())
      .deduplicateWithinWatermark(Seq("_2"))
      .toDataset.collect()
    assert(batch.length == 1 && batch.head._2 == "x")
  }

  test("stream-static join enriches events with a dimension table") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1, "gold"), (2, "silver")).toDF("uid", "tier")
    val in = MemoryStream[(Int, Double)]
    val enriched = in.toDF().toDF("uid", "amount")
      .join(broadcast(dim), "uid") // static side broadcast to every batch
      .select(col("uid"), col("tier"), col("amount"))
    val q = enriched.writeStream.format("memory").queryName("enr_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1, 10.0), (2, 5.0), (3, 1.0)) // uid 3 has no dim row
      q.processAllAvailable()
      val rows = spark.table("enr_out").as[(Int, String, Double)].collect().toSet
      assert(rows == Set((1, "gold", 10.0), (2, "silver", 5.0)))
    } finally q.stop()
  }
}
