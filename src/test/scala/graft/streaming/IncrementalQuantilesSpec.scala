package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.{SparkEntry, SparkSpec}

/** Exact-quantile equality between the streaming histogram and batch
  * q143: sf0.001 lineitem flows in price-interleaved micro-batches (the
  * crossing price keeps moving as cells fill in), and each flag's LAST
  * emitted (total_qty, median_price) must equal the batch weighted
  * median bit-for-bit — the double is recovered from raw bits, never a
  * decimal round-trip. */
class IncrementalQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming weighted median equals batch q143 under interleaved batching") {
    implicit val sqlCtx = spark.sqlContext
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val all = IncrementalQuantiles
        .observations(graft.sources.Tables(spark, dir, "lineitem"))
        .collect().toSeq
      // interleave by price magnitude so each flag's histogram fills
      // from scattered regions and the crossing cell keeps moving
      val batches = (0 until 3).map(i =>
        all.filter(e => math.abs(e.price * 100).toLong % 3 == i.toLong))

      val in = MemoryStream[IncrementalQuantiles.Ev]
      val meds = StreamEnv(spark).fromDataset(in.toDS())
        .keyBy(_.flag)
        .transformWithState(new IncrementalQuantilesProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDataset
      val q = meds.writeStream.format("memory").queryName("inc_quant")
        .outputMode(OutputMode.Update).start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
      } finally q.stop()

      // last emission per flag = the one with the full total
      val got = spark.table("inc_quant")
        .as[(String, Long, Double)].collect().toSeq
        .groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }.toSet

      val want = SparkEntry.queries("q143_weighted_median")(spark, dir)
        .as[(String, Long, Double)].collect().toSet
      assert(got == want, s"got=$got\nwant=$want")
    } finally spark.conf.set(provider, prev)
  }
}
