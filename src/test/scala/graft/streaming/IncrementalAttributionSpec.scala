package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.{SparkEntry, SparkSpec}

/** Convergence of the live attribution ledger to the batch answer: the
  * sf0.001 events arrive interleaved by event_id, so touches routinely
  * land AFTER the purchases they should be credited for — the cross-class
  * revision case. The max-seq verdict per purchase must equal a reference
  * last-touch computation, and the channel rollup must equal q138. */
class IncrementalAttributionSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("ledger converges to batch attribution under out-of-order arrival") {
    implicit val sqlCtx = spark.sqlContext
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val all = IncrementalAttribution
        .observations(graft.sources.Tables(spark, dir, "events"))
        .collect().toSeq
      val batches = (0 until 3).map(i => all.filter(_.eventId % 3 == i.toLong))

      val in = MemoryStream[IncrementalAttribution.Ev]
      val atts = StreamEnv(spark).fromDataset(in.toDS())
        .keyBy(_.userId)
        .transformWithState(new IncrementalAttributionProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDataset
      val q = atts.writeStream.format("memory").queryName("inc_att")
        .outputMode(OutputMode.Update).start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
      } finally q.stop()

      val emitted = spark.table("inc_att")
        .as[(Long, Long, String, Long, Long)].collect().toSeq
      val got = emitted.groupBy(_._2).map { case (_, rs) =>
        val last = rs.maxBy(_._5)
        (last._2, last._3, last._4)
      }.toSet

      // reference: q138's rule applied per purchase in plain Scala
      val want = all.filter(_.eventType == "purchase").map { p =>
        val credited = all
          .filter(t => t.userId == p.userId && t.eventType != "purchase" &&
            (t.us < p.us || (t.us == p.us && t.eventId < p.eventId)) &&
            p.us - t.us <= IncrementalAttribution.WindowUs)
          .sortBy(t => (t.us, t.eventId)).lastOption
        (p.eventId, credited.map(_.eventType).getOrElse("direct"), p.cents)
      }.toSet
      assert(got == want,
        s"extra=${(got -- want).take(5)}\nmissing=${(want -- got).take(5)}")

      // and the channel rollup equals batch q138
      val rollup = got.toSeq.groupBy(_._2).map { case (ch, rs) =>
        (ch, rs.size.toLong, rs.map(_._3).sum)
      }.toSet
      val batch = SparkEntry.queries("q138_attribution")(spark, dir)
        .as[(String, Long, Long)].collect().toSet
      assert(rollup == batch)
    } finally spark.conf.set(provider, prev)
  }
}
