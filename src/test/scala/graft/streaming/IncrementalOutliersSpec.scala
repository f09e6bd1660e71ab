package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.{SparkEntry, SparkSpec}

/** Verdict-equality between the streaming outlier monitor and batch q131:
  * the sf0.001 events flow in adversarially-interleaved micro-batches and
  * each user's FINAL emitted verdict set (the emission carrying that
  * user's full event count) must equal the batch query's rows exactly —
  * including events that only become outliers once later batches fill in
  * their user's distribution. */
class IncrementalOutliersSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("final streaming verdicts equal batch q131 under interleaved batching") {
    implicit val sqlCtx = spark.sqlContext
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val all = IncrementalOutliers
        .observations(graft.sources.Tables(spark, dir, "events"))
        .collect().toSeq
      // interleave by event_id mod 3: most users' histories arrive
      // split across batches, so mid-stream verdicts get revised
      val batches = (0 until 3).map(i => all.filter(_.eventId % 3 == i))

      val in = MemoryStream[IncrementalOutliers.Ev]
      val outs = StreamEnv(spark).fromDataset(in.toDS())
        .keyBy(_.userId)
        .transformWithState(new IncrementalOutliersProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDataset
      val q = outs.writeStream.format("memory").queryName("inc_outliers")
        .outputMode(OutputMode.Update).start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
      } finally q.stop()

      // latest verdict set per user: verdicts carrying the max ANCHOR n
      // (the anchor advances even when an evaluation clears all
      // verdicts, so stale sets cannot masquerade as final)
      val emitted = spark.table("inc_outliers")
        .as[(Long, Long, Long, Long)].collect().toSeq
      val finalN = emitted.filter(_._2 == -1L)
        .groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
      val got = emitted
        .filter(r => r._2 != -1L && finalN.get(r._1).contains(r._4))
        .toSet

      val want = SparkEntry.queries("q131_outlier_events")(spark, dir)
        .select(col("user_id"), col("event_id"), col("cents"), col("n"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == want,
        s"extra=${got -- want}\nmissing=${want -- got}")
      assert(want.nonEmpty, "spec is vacuous: batch q131 found no outliers")
    } finally spark.conf.set(provider, prev)
  }

  test("moments and history survive a stop/restart from checkpoint") {
    // the CheckpointRecoverySpec contract applied to transformWithState
    // on RocksDB: half the events, stop, half while the query is down,
    // restart from the checkpoint — the final verdicts must STILL equal
    // batch q131, which fails if either the per-user moment state or
    // the history list was lost or double-counted across the restart.
    import java.nio.file.Files
    import org.apache.spark.sql.SaveMode
    import org.apache.spark.sql.types._
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val srcDir = Files.createTempDirectory("graft_out_src").toString
      val ckpt = Files.createTempDirectory("graft_out_ckpt").toString
      val outDir = Files.createTempDirectory("graft_out_out").toString
      val schema = StructType(Seq(StructField("eventId", LongType),
        StructField("userId", LongType), StructField("cents", LongType)))

      def startQuery() = StreamEnv(spark)
        .fromDataset(spark.readStream.schema(schema).parquet(srcDir)
          .as[IncrementalOutliers.Ev])
        .keyBy(_.userId)
        .transformWithState(new IncrementalOutliersProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDataset
        .writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[IncrementalOutliers.Out],
              _: Long) =>
            b.write.mode(SaveMode.Append).parquet(outDir)
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update).start()

      val all = IncrementalOutliers
        .observations(graft.sources.Tables(spark, dir, "events"))
        .collect().toSeq
      val (h1, h2) = all.partition(_.eventId % 2 == 0)

      h1.toDS().write.mode(SaveMode.Append).parquet(srcDir)
      val q1 = startQuery()
      q1.processAllAvailable(); q1.stop()
      // second half lands while the query is down
      h2.toDS().write.mode(SaveMode.Append).parquet(srcDir)
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()

      val emitted = spark.read.parquet(outDir)
        .as[(Long, Long, Long, Long)].collect().toSeq
      val finalN = emitted.filter(_._2 == -1L)
        .groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
      val got = emitted
        .filter(r => r._2 != -1L && finalN.get(r._1).contains(r._4))
        .toSet
      val want = graft.SparkEntry
        .queries("q131_outlier_events")(spark, dir)
        .select(col("user_id"), col("event_id"), col("cents"), col("n"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == want,
        s"extra=${(got -- want).take(5)}\nmissing=${(want -- got).take(5)}")
    } finally spark.conf.set(provider, prev)
  }
}
