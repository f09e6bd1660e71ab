package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.{SparkEntry, SparkSpec}

/** Train/serve-skew guarantee for the live feature store: the sf0.001
  * events flow in adversarially-interleaved micro-batches (most day cells
  * get revised after first emission), and the max-seq row per (user, day)
  * must equal batch q135's backfill exactly — day spend, trailing 7-day
  * sum, and trailing active-day count. */
class IncrementalFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("final streaming features equal batch q135 under interleaved batching") {
    implicit val sqlCtx = spark.sqlContext
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val all = IncrementalFeatures
        .observations(graft.sources.Tables(spark, dir, "events"))
        .collect().toSeq
      // interleave by day parity: trailing frames keep getting revised
      // by batches landing BEFORE already-emitted days
      val batches = (0 until 3).map(i => all.filter(_.day % 3 == i.toLong))

      val in = MemoryStream[IncrementalFeatures.Ev]
      val feats = StreamEnv(spark).fromDataset(in.toDS())
        .keyBy(_.userId)
        .transformWithState(new IncrementalFeaturesProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDataset
      val q = feats.writeStream.format("memory").queryName("inc_features")
        .outputMode(OutputMode.Update).start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
      } finally q.stop()

      val emitted = spark.table("inc_features")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      val got = emitted.groupBy(r => (r._1, r._2)).map { case (_, rs) =>
        val last = rs.maxBy(_._6)
        (last._1, last._2, last._3, last._4, last._5)
      }.toSet

      val want = SparkEntry.queries("q135_rolling_features")(spark, dir)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == want,
        s"extra=${(got -- want).take(5)}\nmissing=${(want -- got).take(5)}")
    } finally spark.conf.set(provider, prev)
  }
}
