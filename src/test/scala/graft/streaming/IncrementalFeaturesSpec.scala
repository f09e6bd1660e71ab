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
        .filter(!col("late"))
        .drop("late")
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

  test("beyond-retention events are reported late rows, never absorbed") {
    implicit val sqlCtx = spark.sqlContext
    import IncrementalFeatures.Ev
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val in = MemoryStream[Ev]
    val feats = StreamEnv(spark).fromDataset(in.toDS())
      .keyBy(_.userId)
      .transformWithState(new IncrementalFeaturesProcessor(retentionDays = 10),
        TimeMode.None(), OutputMode.Update())
      .toDataset
    val q = feats.writeStream.format("memory").queryName("inc_feat_ret")
      .outputMode(OutputMode.Update).start()
    try {
      // on-time history, then two stragglers 90 days behind the key's
      // own high water mark — far past the 10-day horizon
      in.addData(Seq(Ev(1L, 100L, 5L), Ev(1L, 103L, 7L)))
      q.processAllAvailable()
      in.addData(Seq(Ev(1L, 13L, 999L), Ev(1L, 10L, 111L)))
      q.processAllAvailable()

      val rows = spark.table("inc_feat_ret")
        .as[IncrementalFeatures.Feature].collect().toSeq
      val late = rows.filter(_.late)
      // both stragglers reported with their rejected payload and a
      // cumulative per-key drop count
      assert(late.map(e => (e.day, e.dayCents)).toSet ==
        Set((13L, 999L), (10L, 111L)))
      assert(late.map(_.seq).sorted == Seq(1L, 2L))
      // and never absorbed: no feature row exists for the late days,
      // and the on-time rows kept their pre-straggler values
      val features = rows.filter(!_.late)
      assert(!features.exists(f => f.day == 13L || f.day == 10L))
      // frame 97..103 holds days 100 (5c) and 103 (7c)
      assert(features.filter(_.day == 103L).map(_.t7Cents).max == 12L)
    } finally q.stop()
    } finally spark.conf.set(provider, prev)
  }

  test("a corrupt far-future event is reported and cannot poison the hwm") {
    import IncrementalFeatures.Ev
    implicit val sqlCtx = spark.sqlContext
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val in = MemoryStream[Ev]
    val feats = StreamEnv(spark).fromDataset(in.toDS())
      .keyBy(_.userId)
      .transformWithState(new IncrementalFeaturesProcessor(
        retentionDays = 10, maxFutureDays = 30),
        TimeMode.None(), OutputMode.Update())
      .toDataset
    val q = feats.writeStream.format("memory").queryName("inc_feat_fut")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(Seq(Ev(1L, 100L, 5L))); q.processAllAvailable()
      // corrupt timestamp 4900 days ahead: must be REPORTED, and must
      // NOT advance the hwm (which would brick the key under the
      // 10-day retention)
      in.addData(Seq(Ev(1L, 5000L, 666L))); q.processAllAvailable()
      // a legitimate on-time event afterwards is absorbed normally
      in.addData(Seq(Ev(1L, 102L, 7L))); q.processAllAvailable()

      val rows = spark.table("inc_feat_fut")
        .as[IncrementalFeatures.Feature].collect().toSeq
      val late = rows.filter(_.late)
      assert(late.map(e => (e.day, e.dayCents)) == Seq((5000L, 666L)))
      val features = rows.filter(!_.late)
      assert(!features.exists(_.day == 5000L))
      // day 102 absorbed, its trailing frame still sees day 100
      assert(features.filter(_.day == 102L).map(_.t7Cents).max == 12L)
    } finally q.stop()
    } finally spark.conf.set(provider, prev)
  }
}
