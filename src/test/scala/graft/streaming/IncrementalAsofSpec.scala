package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The streaming as-of twin against the batch operator: identical
  * (leftId → partner) maps under time-sliced and fully disordered
  * feeds with a covering horizon, one emission per left row, and the
  * state bound itself — right history keeps only the horizon plus one
  * shadow row once the watermark has swept past. */
class IncrementalAsofSpec extends SparkSpec {
  import spark.implicits._
  import IncrementalAsof.{Ev, Match}

  private val dir = "/root/testdata/sf0.001"

  /** q57's frames as tagged Ev rows (view=right, click=left). */
  private def events(): Seq[Ev] =
    graft.sources.Tables(spark, dir, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(col("user_id").cast("long"),
        col("ts").cast("timestamp"),
        when(col("event_type") === "click", 1).otherwise(0),
        col("event_id").cast("long"))
      .as[(Long, java.sql.Timestamp, Int, Long)]
      .collect().toSeq
      .map(t => Ev(t._1, t._2.toInstant, t._3, t._4))

  private def want(): Map[Long, (Long, Boolean)] = {
    val df = events().toDF("key", "ts", "side", "id")
    IncrementalAsof.batchTruth(df)
      .as[(Long, Long, Boolean)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
  }

  /** transformWithState needs RocksDB (multi-column-family state). */
  private def withRocks[T](body: => T): T = {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body finally spark.conf.set(provider, prev)
  }

  private val TolUs = 3600000000L // q165/q174's ±1 h, the nearest tests

  private def nearestWant(): Map[Long, (Long, Boolean)] = {
    val df = events().toDF("key", "ts", "side", "id")
    IncrementalAsof.nearestTruth(df, TolUs)
      .as[(Long, Long, Boolean)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
  }

  private def run(feeds: Seq[Seq[Ev]], lateness: String,
      name: String, tolUs: Long = -1L): Seq[Match] = withRocks {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val ds =
      if (tolUs >= 0) IncrementalAsof.nearest(in.toDS(), lateness, tolUs)
      else IncrementalAsof.enriched(in.toDS(), lateness)
    val q = ds
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      feeds.foreach { f => in.addData(f); q.processAllAvailable() }
      // one extra pass so timers armed by the last data batch fire
      in.addData(Seq.empty[Ev]); q.processAllAvailable()
      spark.table(name).as[Match].collect().toSeq
    } finally q.stop()
  }

  private def sentinel(all: Seq[Ev], bump: Long) = Ev(-1L,
    all.map(_.ts).maxBy(_.toEpochMilli).plusMillis(bump), 0, -1L)

  test("time-sliced feed equals the batch as-of, one emission per left") {
    val all = events().sortBy(_.ts)
    val cuts = Seq(all.size / 3, 2 * all.size / 3, all.size)
    val feeds = (Seq(0) ++ cuts).sliding(2)
      .map { case Seq(a, b) => all.slice(a, b) }.toSeq :+
      Seq(sentinel(all, 366L * 86400L * 1000L))
    val got = run(feeds, "0 seconds", "asof_sliced")
    assert(got.size == got.map(_.leftId).distinct.size,
      "a left row emitted more than once")
    assert(got.map(m => m.leftId ->
      (m.rightId, m.matched)).toMap == want(),
      "time-sliced streaming as-of diverged from batch")
  }

  test("fully disordered feed under a covering horizon equals batch") {
    val all = events()
    val span = all.map(_.ts.toEpochMilli).max - all.map(_.ts.toEpochMilli).min
    val scrambled = all.sortBy(e => (e.ts.toEpochMilli % 5, e.id))
    val half = scrambled.size / 2
    val feeds = Seq(scrambled.take(half), scrambled.drop(half),
      Seq(sentinel(all, 2 * span + 1)))
    val got = run(feeds, s"${2 * span} milliseconds", "asof_disordered")
    assert(got.map(m => m.leftId ->
      (m.rightId, m.matched)).toMap == want(),
      "disordered streaming as-of diverged from batch")
  }

  test("nearest: time-sliced feed equals TemporalJoins.nearest") {
    val all = events().sortBy(_.ts)
    val cuts = Seq(all.size / 3, 2 * all.size / 3, all.size)
    val feeds = (Seq(0) ++ cuts).sliding(2)
      .map { case Seq(a, b) => all.slice(a, b) }.toSeq :+
      Seq(sentinel(all, 366L * 86400L * 1000L))
    val got = run(feeds, "0 seconds", "near_sliced", tolUs = TolUs)
    assert(got.size == got.map(_.leftId).distinct.size,
      "a left row emitted more than once")
    assert(got.map(m => m.leftId ->
      (m.rightId, m.matched)).toMap == nearestWant(),
      "time-sliced streaming nearest diverged from batch")
  }

  test("nearest: fully disordered feed under a covering horizon") {
    val all = events()
    val span = all.map(_.ts.toEpochMilli).max - all.map(_.ts.toEpochMilli).min
    val scrambled = all.sortBy(e => (e.ts.toEpochMilli % 7, e.id))
    val half = scrambled.size / 2
    val feeds = Seq(scrambled.take(half), scrambled.drop(half),
      Seq(sentinel(all, 2 * span + 1)))
    val got = run(feeds, s"${2 * span} milliseconds", "near_disordered",
      tolUs = TolUs)
    assert(got.map(m => m.leftId ->
      (m.rightId, m.matched)).toMap == nearestWant(),
      "disordered streaming nearest diverged from batch")
  }

  test("nearest: equal-distance neighbors resolve backward") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.time.Instant.parse("2024-03-01T00:00:00Z")
    val rows = Seq(
      Ev(7L, base, 0, 100L),                   // right, lt-60s
      Ev(7L, base.plusSeconds(60), 1, 1L),     // left
      Ev(7L, base.plusSeconds(120), 0, 200L))  // right, lt+60s
    val got = run(Seq(rows, Seq(sentinel(rows, 86400000L))),
      "0 seconds", "near_tie", tolUs = TolUs)
    assert(got.map(m => m.leftId -> m.rightId).toMap == Map(1L -> 100L),
      "distance tie must resolve to the backward partner")
  }

  test("pending lefts and right history survive a stop/restart") {
    withRocks {
      // memory sink can't recover; file source + foreachBatch->parquet
      // is the recoverable shape (CheckpointRecoverySpec's pattern)
      val srcDir = java.nio.file.Files
        .createTempDirectory("graft_asof_src").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_asof_ckpt").toString
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_asof_out").toString
      val base = java.time.Instant.parse("2024-02-01T00:00:00Z")
      def startQuery() = IncrementalAsof.enriched(
          spark.readStream
            .schema("key LONG, ts TIMESTAMP, side INT, id LONG")
            .parquet(srcDir).as[Ev], "1 hour")
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[Match], _: Long) =>
            batch.write.mode(org.apache.spark.sql.SaveMode.Append)
              .parquet(outDir)
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
      // batch 1: a right and its left land; the watermark has not
      // released the left when the query stops
      Seq(Ev(3L, base, 0, 500L), Ev(3L, base.plusSeconds(60), 1, 600L))
        .toDF().write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(srcDir)
      val q1 = startQuery()
      q1.processAllAvailable()
      q1.stop()
      // restart: only the watermark-advancing sentinel arrives after —
      // the match can only be right if BOTH buffered sides recovered
      Seq(Ev(-1L, base.plusSeconds(90000), 0, -1L))
        .toDF().write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(srcDir)
      val q2 = startQuery()
      try {
        q2.processAllAvailable()
        val out = spark.read.parquet(outDir).as[Match].collect().toSeq
        assert(out.contains(Match(600L, 500L, matched = true)),
          s"state lost across restart: $out")
        assert(out.count(_.leftId == 600L) == 1, "duplicate emission")
      } finally q2.stop()
    }
  }

  test("right history evicts to the horizon + shadow after the sweep") {
    withRocks {
    implicit val sqlCtx = spark.sqlContext
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    // one key, many rights strictly before a final left: after the
    // watermark passes everything, the state must NOT hold all rights
    val rights = (0 until 200).map(i =>
      Ev(7L, base.plusSeconds(i), 0, 100L + i))
    val in = MemoryStream[Ev]
    val q = IncrementalAsof.enriched(in.toDS(), "0 seconds")
      .writeStream.format("memory").queryName("asof_evict")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(rights); q.processAllAvailable()
      in.addData(Seq(Ev(7L, base.plusSeconds(1000), 1, 9999L)))
      q.processAllAvailable()
      in.addData(Seq(Ev(-1L, base.plusSeconds(5000), 0, -1L)))
      q.processAllAvailable()
      in.addData(Seq.empty[Ev]); q.processAllAvailable()
      val out = spark.table("asof_evict").as[Match].collect()
      assert(out.exists(m => m.leftId == 9999L && m.rightId == 299L),
        s"wrong partner: ${out.toSeq}")
      val kept = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(kept < 10,
        s"right history not evicted: $kept state rows for 200 rights")
    } finally q.stop()
    }
  }
}
