package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.{SparkEntry, SparkSpec}

/** Coverage-equality between the streaming OOV monitor and batch q237:
  * the sf0.001 documents stream in as interleaved micro-batches —
  * deliberately NOT train-first, so vocabulary bits flip mid-stream and
  * the re-emission/compaction path is exercised — and the compacted
  * report must equal the batch query's rows bitwise. */
class IncrementalOovSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming OOV report equals batch q237 after the last batch") {
    implicit val sqlCtx = spark.sqlContext
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = graft.sources.Tables(spark, dir, "documents")
      val all = IncrementalOov.observations(docs).collect().toSeq
      val batches = (0 until 3).map(i => all.zipWithIndex
        .collect { case (o, j) if j % 3 == i => o })
      // the interleaving must actually exercise a vocabulary flip:
      // some word's first train occurrence must come AFTER one of its
      // non-train occurrences across the batch boundaries
      assert(batches.head.exists(_.isTrain == 0L),
        "interleaving must put non-train tokens in the first batch")

      val in = MemoryStream[IncrementalOov.Tok]
      val wc = StreamEnv(spark).fromDataset(in.toDS())
        .keyBy(_.tok)
        .transformWithState(new IncrementalOovProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDataset
      val q = wc.writeStream.format("memory").queryName("inc_oov")
        .outputMode(OutputMode.Update).start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
      } finally q.stop()

      val got = IncrementalOov.report(spark.table("inc_oov"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val want = SparkEntry.queries("q237_oov_rate")(spark, dir)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(got == want, "final streaming OOV report must equal batch q237")
    } finally spark.conf.set(provider, prev)
  }
}
