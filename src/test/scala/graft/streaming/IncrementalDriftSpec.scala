package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.{SparkEntry, SparkSpec}

/** Drift-equality between the streaming monitor and batch q128: the
  * post-cutoff sf0.001 events flow in as micro-batches, and each type's
  * LAST emitted drift row must carry exactly the batch query's
  * (n_a, n_b, tv_num, tv_den) — the exact-integer TV arithmetic is
  * shared, so equality is bitwise, not approximate. */
class IncrementalDriftSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val cutoff = "2024-01-15"

  test("streaming drift equals batch q128 after the last batch") {
    implicit val sqlCtx = spark.sqlContext
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = graft.sources.Tables(spark, dir, "events")
      val ref = IncrementalDrift.reference(events, cutoff)
      val all = IncrementalDrift.observations(events, cutoff)
        .collect().toSeq
      // batches interleaved by bucket parity so each type's buckets
      // fill in different orders across batches
      val batches = (0 until 3).map(i => all.filter(_.bucket % 3 == i))

      val in = MemoryStream[IncrementalDrift.Obs]
      val drift = StreamEnv(spark).fromDataset(in.toDS())
        .keyBy(_.eventType)
        .transformWithState(new IncrementalDriftProcessor(ref),
          TimeMode.None(), OutputMode.Update())
        .toDataset
      val q = drift.writeStream.format("memory").queryName("inc_drift")
        .outputMode(OutputMode.Update).start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
      } finally q.stop()

      // last emission per type = the one having absorbed all its events
      val got = spark.table("inc_drift")
        .groupBy(col("eventType"))
        .agg(max_by(struct(col("nRef"), col("tvNum"), col("tvDen")),
          col("nCur")).as("s"), max(col("nCur")).as("nCur"))
        .select(col("eventType"), col("s.nRef"), col("nCur"),
          col("s.tvNum"), col("s.tvDen"))
        .as[(String, Long, Long, Long, Long)].collect().toSet

      val want = SparkEntry.queries("q128_distribution_drift")(spark, dir)
        .select(col("event_type"), col("n_a"), col("n_b"),
          col("tv_num"), col("tv_den"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(got == want, "final streaming drift must equal batch q128")
    } finally spark.conf.set(provider, prev)
  }
}
