package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.{SparkEntry, SparkSpec}

/** Snapshot-equality between the streaming changelog compaction and
  * batch q116: the sf0.001 events flow in as out-of-order micro-batches,
  * and the latest emission per key must reconstruct exactly the batch
  * query's compacted table — live rows match q116's rows, tombstoned
  * keys are exactly the keys q116 drops. */
class IncrementalCompactionSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming snapshots equal batch q116 on the sf0.001 changelog") {
    implicit val sqlCtx = spark.sqlContext
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val all = IncrementalCompaction
        .changes(graft.sources.Tables(spark, dir, "events"))
        .collect().toSeq
      // adversarial batching: interleave by event_id mod 3 so most keys'
      // changes arrive out of ts order across batches
      val batches = (0 until 3).map(i => all.filter(_.eventId % 3 == i))

      val in = MemoryStream[IncrementalCompaction.Change]
      val snaps = StreamEnv(spark).fromDataset(in.toDS())
        .keyBy(_.userId)
        .transformWithState(new IncrementalCompactionProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDataset
      val q = snaps.writeStream.format("memory").queryName("inc_compact")
        .outputMode(OutputMode.Update).start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
      } finally q.stop()

      // latest emission per key = the one that absorbed the most changes
      val latest = spark.table("inc_compact")
        .groupBy(col("userId"))
        .agg(max_by(
          struct(col("tsMicros"), col("eventId"), col("eventType"),
            col("cents"), col("live")),
          col("nChanges")).as("s"),
          max(col("nChanges")).as("n_changes"))
        .select(col("userId").as("user_id"), col("s.tsMicros"),
          col("s.eventType").as("last_type"), col("s.cents").as("last_cents"),
          col("n_changes"), col("s.live"))

      val want = SparkEntry.queries("q116_changelog_compact")(spark, dir)
        .select(col("user_id"), unix_micros(col("last_ts")).as("tsMicros"),
          col("last_type"), col("last_cents"), col("n_changes"))
        .as[(Long, Long, String, Long, Long)].collect().toSet

      val live = latest.filter(col("live"))
        .select(col("user_id"), col("tsMicros"), col("last_type"),
          col("last_cents"), col("n_changes"))
        .as[(Long, Long, String, Long, Long)].collect().toSet
      assert(live == want, "live snapshots must equal the batch table")

      // tombstoned keys = exactly the keys the batch query drops, and
      // every changelog key is accounted for one way or the other
      val allKeys = all.map(_.userId).toSet
      val deadKeys = latest.filter(!col("live"))
        .select(col("user_id")).as[Long].collect().toSet
      assert(deadKeys == allKeys -- want.map(_._1),
        "tombstones must be exactly the batch-dropped keys")
    } finally spark.conf.set(provider, prev)
  }

  test("beyond-retention changes are reported late rows, never absorbed") {
    implicit val sqlCtx = spark.sqlContext
    import IncrementalCompaction.{Change, Snapshot}
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val in = MemoryStream[Change]
    val snaps = StreamEnv(spark).fromDataset(in.toDS())
      .keyBy(_.userId)
      .transformWithState(
        new IncrementalCompactionProcessor(retentionMicros = 1000L),
        TimeMode.None(), OutputMode.Update())
      .toDataset
    val q = snaps.writeStream.format("memory").queryName("inc_comp_ret")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(Seq(Change(1L, 10000L, 1L, "click", 5L)))
      q.processAllAvailable()
      // 9000 us and 8500 us behind the key's watermark: both > 1000 us
      // retention, both must be rejected and reported
      in.addData(Seq(Change(1L, 1000L, 2L, "view", 7L),
        Change(1L, 1500L, 3L, "error", 9L)))
      q.processAllAvailable()
      // an in-retention out-of-order change still absorbs (loses by ts)
      in.addData(Seq(Change(1L, 9500L, 4L, "view", 11L)))
      q.processAllAvailable()

      val rows = spark.table("inc_comp_ret").as[Snapshot].collect().toSeq
      val late = rows.filter(_.late)
      assert(late.map(c => (c.tsMicros, c.eventId)).toSet ==
        Set((1000L, 2L), (1500L, 3L)))
      assert(late.map(_.nChanges).sorted == Seq(1L, 2L))
      // the snapshot never saw the stragglers: still the first change's
      // payload, nChanges counts only absorbed rows (1 win + 1 loser)
      val last = rows.filter(r => !r.late).maxBy(_.nChanges)
      assert(last.eventId == 1L && last.cents == 5L && last.nChanges == 2L)
    } finally q.stop()
    } finally spark.conf.set(provider, prev)
  }
}
