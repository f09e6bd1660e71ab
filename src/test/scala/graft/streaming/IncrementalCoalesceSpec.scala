package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** IncrementalCoalesce against batch q199: identical islands (index,
  * span, membership count) under time-sliced and within-horizon
  * disordered feeds, exactly one emission per island, late-beyond-
  * horizon drops, and the final-island close on watermark advance. */
class IncrementalCoalesceSpec extends SparkSpec {
  import spark.implicits._
  import IncrementalCoalesce.{Interval, Island}

  /** event time = s0 (µs -> Instant); base-shifted off zero. */
  private def iv(k: Long, id: Long, s0: Long, e0: Long): Interval =
    Interval(k, id, s0, e0, java.time.Instant.ofEpochMilli(s0 / 1000L))

  private def intervals(): Seq[Interval] = {
    val rnd = new scala.util.Random(13)
    (0L until 300L).map { id =>
      val k = rnd.nextInt(4).toLong
      val s0 = 1000000L + rnd.nextInt(500) * 10000L
      iv(k, id, s0, s0 + rnd.nextInt(40000).toLong)
    }
  }

  private def want(ivs: Seq[Interval]): Set[(Long, Long, Long, Long, Long, Long)] =
    IncrementalCoalesce.batchTruth(
        ivs.map(i => (i.k, i.id, i.s0, i.e0)).toDF("k", "id", "s0", "e0"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet

  private def withRocks[T](body: => T): T = {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body finally spark.conf.set(provider, prev)
  }

  /** A sentinel far past everything — beyond max(e0) plus any horizon a
    * test declares — so the final watermark sweeps every island. */
  private def sentinel(all: Seq[Interval]): Interval =
    iv(99L, all.map(_.id).max + 1L,
      all.map(_.e0).max + 360000000000L, all.map(_.e0).max + 360000001000L)

  private def run(feeds: Seq[Seq[Interval]], lateness: String,
      name: String): Seq[Island] = withRocks {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Interval]
    val q = IncrementalCoalesce.islands(in.toDS(), lateness)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      feeds.foreach { f => in.addData(f); q.processAllAvailable() }
      in.addData(Seq.empty[Interval]); q.processAllAvailable()
      spark.table(name).as[Island].collect().toSeq
    } finally q.stop()
  }

  private def asSet(got: Seq[Island]) =
    got.filter(_.k != 99L)
      .map(i => (i.k, i.island, i.spanS0, i.spanE0, i.nIntervals,
        i.coveredUs)).toSet

  test("time-sliced feed reproduces the batch islands exactly once") {
    val ivs = intervals()
    val feeds = ivs.sortBy(_.s0).grouped(60).toSeq :+ Seq(sentinel(ivs))
    val got = run(feeds, "10 seconds", "coalesce_sliced")
    assert(got.size == got.distinct.size, "duplicate emission")
    assert(asSet(got) == want(ivs))
  }

  test("within-horizon disorder converges to the same islands") {
    val ivs = intervals()
    val rnd = new scala.util.Random(5)
    val feeds = rnd.shuffle(ivs).grouped(75).toSeq :+ Seq(sentinel(ivs))
    // horizon must cover the full shuffle span of the event times
    val got = run(feeds, "2 hours", "coalesce_disorder")
    assert(asSet(got) == want(ivs))
  }

  test("open island, frontier, and pending all survive a stop/restart") {
    withRocks {
      val srcDir = java.nio.file.Files
        .createTempDirectory("graft_coal_src").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_coal_ckpt").toString
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_coal_out").toString
      def startQuery() = IncrementalCoalesce.islands(
          spark.readStream
            .schema("k LONG, id LONG, s0 LONG, e0 LONG, ts TIMESTAMP")
            .parquet(srcDir).as[Interval], "0 milliseconds")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Island],
            _: Long) =>
          batch.write.mode(org.apache.spark.sql.SaveMode.Append)
            .parquet(outDir)
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .start()
      // batch 1: A's island closes (wm reaches B's start); B itself
      // stays PENDING (s0 == watermark is not < it) — so the stopped
      // state holds a used island counter, a frontier, AND a buffer
      Seq(iv(1L, 1L, 1000000L, 2000000L), iv(1L, 2L, 5000000L, 6000000L))
        .toDF().write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(srcDir)
      val q1 = startQuery()
      q1.processAllAvailable(); q1.stop()
      // restart: C overlaps B — island 2 spans B∪C only if B's pending
      // row and the counter both recovered; a lost counter would
      // renumber it island 1, a lost buffer would shrink it to C alone
      Seq(iv(1L, 3L, 5500000L, 7000000L),
          iv(99L, 100000L, 360000000000L, 360000001000L))
        .toDF().write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(srcDir)
      val q2 = startQuery()
      try {
        q2.processAllAvailable()
        Seq(iv(99L, 200000L, 720000000000L, 720000001000L))
          .toDF().write.mode(org.apache.spark.sql.SaveMode.Append)
          .parquet(srcDir)
        q2.processAllAvailable()
        val out = spark.read.parquet(outDir).as[Island].collect().toSeq
          .filter(_.k == 1L).sortBy(_.island)
        assert(out == Seq(
          Island(1L, 1L, 1000000L, 2000000L, 1L, 1000000L),
          Island(1L, 2L, 5000000L, 7000000L, 2L, 2000000L)),
          s"state lost or double-emitted across restart: $out")
      } finally q2.stop()
    }
  }

  test("a beyond-horizon straggler is dropped, not re-coalesced") {
    val early = iv(1L, 1L, 1000000L, 2000000L)
    val late = iv(1L, 2L, 1500000L, 9000000L) // would extend island 1
    val far = iv(1L, 3L, 7200000000L, 7200100000L)
    val got = run(Seq(Seq(early), Seq(far), Seq(late),
      Seq(sentinel(Seq(early, late, far)))), "1 second", "coalesce_late")
      .filter(_.k == 1L)
    // island 1 closed at its original extent; the straggler vanished
    assert(got.map(i => (i.island, i.spanS0, i.spanE0, i.nIntervals)) ==
      Seq((1L, 1000000L, 2000000L, 1L), (2L, 7200000000L, 7200100000L, 1L)))
  }
}
