package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Live interval matching vs the native batch sweep: identical pair
  * sets under time-sliced AND fully disordered feeds (within a covering
  * horizon), exactly-once emission per pair, and the eviction bound —
  * after the watermark passes every end, state must not hold the
  * stream. */
class IncrementalOverlapSpec extends SparkSpec {
  import spark.implicits._
  import IncrementalOverlap.{Iv, Pair}

  private val base = java.time.Instant.parse("2024-03-01T00:00:00Z")
  private def at(sec: Long) = base.plusSeconds(sec)
  private def us(sec: Long) = at(sec).getEpochSecond * 1000000L

  private val rnd = new scala.util.Random(37)
  private val ivs: Seq[Iv] = (0 until 160).map { i =>
    val s = rnd.nextInt(600).toLong
    // key and side decorrelated (i%4 with i%2 would give every key
    // rows of only ONE side and an empty truth set)
    Iv(i % 4, at(s), us(s + rnd.nextInt(60)), (i / 4) % 2, 5000 + i)
  }

  private def withRocks[A](f: => A): A = {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally spark.conf.set(provider, prev)
  }

  private def run(batches: Seq[Seq[Iv]], lateness: String,
      name: String): (Set[(Long, Long, Long)], Long) = withRocks {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Iv]
    val q = IncrementalOverlap.pairs(in.toDS(), lateness)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      // watermark sentinel far past every end, then an empty batch so
      // the advanced watermark drives timer eviction
      in.addData(Seq(Iv(-1L, at(100000), us(100000), 0, -1L)))
      q.processAllAvailable()
      in.addData(Seq.empty[Iv]); q.processAllAvailable()
      val rows = spark.table(name).as[Pair].collect()
      val state = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      (rows.map(p => (p.key, p.leftId, p.rightId)).toSet, state)
    } finally q.stop()
  }

  private lazy val truth: Set[(Long, Long, Long)] =
    IncrementalOverlap.batchTruth(ivs.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("time-sliced feed equals the native batch sweep") {
    val sliced = ivs.sortBy(_.ts).grouped(40).toSeq
    val (got, _) = run(sliced, "10 minutes", "ovl_sliced")
    assert(truth.nonEmpty && got == truth,
      s"extra=${(got -- truth).take(5)} missing=${(truth -- got).take(5)}")
  }

  test("fully disordered feed (covering horizon) equals batch; state evicts") {
    val shuffled = rnd.shuffle(ivs.toList).grouped(40).toSeq
    val (got, state) = run(shuffled, "11 minutes", "ovl_shuffled")
    assert(got == truth,
      s"extra=${(got -- truth).take(5)} missing=${(truth -- got).take(5)}")
    assert(state < 20,
      s"state not evicted after the sweep: $state rows for ${ivs.size} intervals")
  }

  test("buffered intervals survive a stop/restart from checkpoint") {
    withRocks {
      val srcDir = java.nio.file.Files
        .createTempDirectory("graft_ovl_src").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_ovl_ckpt").toString
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_ovl_out").toString
      def startQuery() = IncrementalOverlap.pairs(
          spark.readStream
            .schema("key LONG, ts TIMESTAMP, endUs LONG, side INT, id LONG")
            .parquet(srcDir).as[Iv], "1 hour")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Pair], _: Long) =>
          batch.write.mode(org.apache.spark.sql.SaveMode.Append)
            .parquet(outDir)
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
      // batch 1: a lone left interval — it lives ONLY in state
      Seq(Iv(4L, at(100), us(200), 1, 70L)).toDF()
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(srcDir)
      val q1 = startQuery()
      q1.processAllAvailable(); q1.stop()
      // restart: an overlapping right arrives — the pair can only
      // emit if the buffered left recovered from the checkpoint
      Seq(Iv(4L, at(150), us(250), 0, 71L)).toDF()
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(srcDir)
      val q2 = startQuery()
      try {
        q2.processAllAvailable()
        val out = spark.read.parquet(outDir).as[Pair].collect().toSeq
        assert(out.contains(Pair(4L, 70L, 71L)),
          s"state lost across restart: $out")
        assert(out.size == 1, s"duplicate emission: $out")
      } finally q2.stop()
    }
  }

  test("each pair emits exactly once") {
    implicit val sqlCtx = spark.sqlContext
    withRocks {
      val in = MemoryStream[Iv]
      val q = IncrementalOverlap.pairs(in.toDS(), "10 minutes")
        .writeStream.format("memory").queryName("ovl_once")
        .outputMode(OutputMode.Append).start()
      try {
        // same two intervals visited across three batches of extras:
        // their pair must appear exactly once
        in.addData(Seq(Iv(9L, at(10), us(50), 1, 1L)))
        q.processAllAvailable()
        in.addData(Seq(Iv(9L, at(20), us(40), 0, 2L)))
        q.processAllAvailable()
        in.addData(Seq(Iv(9L, at(30), us(35), 1, 3L)))
        q.processAllAvailable()
        val rows = spark.table("ovl_once").as[Pair].collect().toSeq
        assert(rows.count(p => p.leftId == 1L && p.rightId == 2L) == 1)
        assert(rows.count(p => p.leftId == 3L && p.rightId == 2L) == 1)
      } finally q.stop()
    }
  }

  test("re-arming replaces the eviction timer instead of accumulating") {
    // one key, ten batches, each adding an interval whose end is LOWER
    // than every previous end while all ends stay far above the
    // watermark: minEnd (the timer target) moves every batch, so
    // evictAndArm re-arms every batch. The r8 fix deletes the
    // previously registered timer on each move; without it every batch
    // leaves one more live timer. The engine's own timer metrics make
    // the leak observable: live = registered - deleted - expired summed
    // over all batches, which must end at 1 (the single armed timer) —
    // pre-fix it ends at the batch count.
    implicit val sqlCtx = spark.sqlContext
    withRocks {
      val in = MemoryStream[Iv]
      val q = IncrementalOverlap.pairs(in.toDS(), "5 seconds")
        .writeStream.format("memory").queryName("ovl_timers")
        .outputMode(OutputMode.Append).start()
      try {
        for (i <- 0 until 10) {
          // left side only; ends 3000-i sec out, strictly decreasing
          in.addData(Seq(Iv(7L, at(10L * i), us(3000 - i), 1, 100L + i)))
          q.processAllAvailable()
        }
        val m = q.recentProgress.flatMap(_.stateOperators)
          .map(o => (o.customMetrics.getOrDefault("numRegisteredTimers", 0L),
            o.customMetrics.getOrDefault("numDeletedTimers", 0L),
            o.customMetrics.getOrDefault("numExpiredTimers", 0L)))
        val reg = m.map(_._1.longValue).sum
        val del = m.map(_._2.longValue).sum
        val exp = m.map(_._3.longValue).sum
        val live = reg - del - exp
        assert(reg >= 10, s"expected a registration per batch, got $reg")
        assert(live == 1,
          s"timers accumulated: $reg registered, $del deleted, " +
            s"$exp expired -> $live live (want exactly the one armed timer)")
      } finally q.stop()
    }
  }
}
