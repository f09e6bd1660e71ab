package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.{SparkEntry, SparkSpec}

/** View-equality between the streaming materialized-view maintenance and
  * batch q117: the sf0.001 events flow in as micro-batches under several
  * adversarial splits, and the latest emission per key must equal the
  * batch recompute exactly — the commutative-monoid argument made
  * observable. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming view equals batch q117 under any batching") {
    implicit val sqlCtx = spark.sqlContext
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val all = IncrementalAgg
        .contribs(graft.sources.Tables(spark, dir, "events"))
        .collect().toSeq
      val want = SparkEntry.queries("q117_incremental_agg")(spark, dir)
        .select(col("user_id"), col("n_events"), col("cents"),
          unix_micros(col("last_ts")).as("lastTsMicros"))
        .as[(Long, Long, Long, Long)].collect().toSet

      for (nBatches <- Seq(1, 4, 9)) {
        // interleave by tsMicros mod n so each key's events scatter
        // across batches in neither arrival nor time order
        val batches =
          (0 until nBatches).map(i => all.filter(_.tsMicros % nBatches == i))
        val in = MemoryStream[IncrementalAgg.Contrib]
        val views = StreamEnv(spark).fromDataset(in.toDS())
          .keyBy(_.userId)
          .transformWithState(new IncrementalAggProcessor,
            TimeMode.None(), OutputMode.Update())
          .toDataset
        val name = s"inc_agg_$nBatches"
        val q = views.writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Update).start()
        try {
          batches.foreach { b => in.addData(b); q.processAllAvailable() }
        } finally q.stop()

        // latest emission per key = the one with the highest fold count
        val got = spark.table(name)
          .groupBy(col("userId"))
          .agg(max_by(struct(col("cents"), col("lastTsMicros")),
            col("nEvents")).as("s"), max(col("nEvents")).as("nEvents"))
          .select(col("userId"), col("nEvents"), col("s.cents"),
            col("s.lastTsMicros"))
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(got == want, s"diverged from batch q117 at $nBatches batches")
      }
    } finally spark.conf.set(provider, prev)
  }
}
