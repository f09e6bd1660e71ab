package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.{SparkEntry, SparkSpec}

/** Savings-equality between the streaming chunk store and batch q244:
  * the sf0.001 documents' chunks stream in as interleaved
  * micro-batches and the compacted per-source report must equal the
  * batch query's rows bitwise — the chunk projection, the counts and
  * the ppm arithmetic are all shared. */
class IncrementalCdcStoreSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming chunk-store report equals batch q244 after the last batch") {
    implicit val sqlCtx = spark.sqlContext
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = graft.sources.Tables(spark, dir, "documents")
      val all = IncrementalCdcStore.observations(docs).collect().toSeq
      val batches = (0 until 3).map(i => all.zipWithIndex
        .collect { case (o, j) if j % 3 == i => o })

      val in = MemoryStream[IncrementalCdcStore.Chunk]
      val cc = StreamEnv(spark).fromDataset(in.toDS())
        .keyBy(c => c.source + "|" + c.h)
        .transformWithState(new IncrementalCdcStoreProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDataset
      val q = cc.writeStream.format("memory").queryName("inc_cdc")
        .outputMode(OutputMode.Update).start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
      } finally q.stop()

      val got = IncrementalCdcStore.report(spark.table("inc_cdc"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val want = SparkEntry.queries("q244_cdc_chunks")(spark, dir)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(got == want,
        "final streaming chunk-store report must equal batch q244")
    } finally spark.conf.set(provider, prev)
  }
}
