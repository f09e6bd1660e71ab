package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.{SparkEntry, SparkSpec}

/** Online/offline parity for the live changepoint monitor: the sf0.001
  * events flow in adversarially-interleaved micro-batches (every user's
  * history is revised repeatedly after first emission — a changepoint is
  * a whole-history statistic, so each revision may MOVE it), and the
  * max-seq row per user must equal batch q172 exactly: same n_days, same
  * split index/day, same integer discrepancy. */
class IncrementalChangepointSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("final streaming changepoints equal batch q172 under interleaved batching") {
    implicit val sqlCtx = spark.sqlContext
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val all = IncrementalFeatures
        .observations(graft.sources.Tables(spark, dir, "events"))
        .collect().toSeq
      // interleave by day remainder: histories grow out of order, and
      // early-emitted changepoints are invalidated by later batches
      val batches = (0 until 3).map(i => all.filter(_.day % 3 == i.toLong))

      val in = MemoryStream[IncrementalFeatures.Ev]
      val cps = StreamEnv(spark).fromDataset(in.toDS())
        .keyBy(_.userId)
        .transformWithState(new IncrementalChangepointProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDataset
      val q = cps.writeStream.format("memory").queryName("inc_cp")
        .outputMode(OutputMode.Update).start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
      } finally q.stop()

      val emitted = spark.table("inc_cp")
        .as[IncrementalChangepoint.Cp].collect().toSeq
      val got = emitted.groupBy(_.userId).map { case (_, rs) =>
        val last = rs.maxBy(_.seq)
        (last.userId, last.nDays, last.cpI, last.cpDay, last.disc)
      }.toSet

      val want = SparkEntry.queries("q172_changepoint")(spark, dir)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(want.nonEmpty, "batch q172 returned no rows at sf0.001")
      assert(got == want,
        s"extra=${(got -- want).take(5)}\nmissing=${(want -- got).take(5)}")
    } finally spark.conf.set(provider, prev)
  }

  test("below the 8-day minimum nothing emits; crossing it emits") {
    implicit val sqlCtx = spark.sqlContext
    import IncrementalFeatures.Ev
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val in = MemoryStream[Ev]
    val cps = StreamEnv(spark).fromDataset(in.toDS())
      .keyBy(_.userId)
      .transformWithState(new IncrementalChangepointProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDataset
    val q = cps.writeStream.format("memory").queryName("inc_cp_min")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData((1L to 7L).map(d => Ev(9L, d, d * 10)))
      q.processAllAvailable()
      assert(spark.table("inc_cp_min").count() == 0)
      in.addData(Seq(Ev(9L, 8L, 1000L)))
      q.processAllAvailable()
      val rows = spark.table("inc_cp_min")
        .as[IncrementalChangepoint.Cp].collect().toSeq
      assert(rows.map(_.nDays) == Seq(8L))
      // history 10,20,...,70,1000: the level shift is at the last day's
      // boundary — split just before it maximizes |cum*n - total*i|
      assert(rows.head.cpI == 7L && rows.head.cpDay == 7L)
    } finally q.stop()
    } finally spark.conf.set(provider, prev)
  }

  test("day histograms survive a stop/restart from checkpoint") {
    import IncrementalFeatures.Ev
    import IncrementalChangepoint.Cp
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val srcDir = java.nio.file.Files
        .createTempDirectory("graft_cp_src").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_cp_ckpt").toString
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_cp_out").toString
      def startQuery() = StreamEnv(spark).fromDataset(
          spark.readStream
            .schema("userId LONG, day LONG, cents LONG")
            .parquet(srcDir).as[Ev])
        .keyBy(_.userId)
        .transformWithState(new IncrementalChangepointProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDataset
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Cp], _: Long) =>
          batch.write.mode(org.apache.spark.sql.SaveMode.Append)
            .parquet(outDir)
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update).start()
      // batch 1: seven quiet days — below the emission threshold, so
      // everything lives ONLY in state when the query stops
      (1L to 7L).map(d => Ev(5L, d, 10L)).toDF()
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(srcDir)
      val q1 = startQuery()
      q1.processAllAvailable(); q1.stop()
      // restart: the eighth day (a large shift) arrives alone — the
      // emitted changepoint can only be right if the histogram recovered
      Seq(Ev(5L, 8L, 1000L)).toDF()
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(srcDir)
      val q2 = startQuery()
      try {
        q2.processAllAvailable()
        val out = spark.read.parquet(outDir).as[Cp].collect().toSeq
        assert(out.nonEmpty, "no emission after restart: state lost")
        val last = out.maxBy(_.seq)
        assert(last.nDays == 8L && last.cpI == 7L && last.cpDay == 7L,
          s"recovered history wrong: $last")
      } finally q2.stop()
    } finally spark.conf.set(provider, prev)
  }
}
