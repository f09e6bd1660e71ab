package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.{SparkEntry, SparkSpec}

/** Pair-set equality between the streaming SimHash block index and
  * batch q38 — the first twin whose full RESULT SET (not a per-doc
  * verdict) reproduces its batch query exactly, because every pair is
  * found when the later of its docs arrives, whatever the feed order
  * or batch boundaries. The feed is deliberately SHUFFLED (seeded) and
  * split across several micro-batches to exercise exactly that
  * order-independence; one batch replays a slice to exercise the
  * at-least-once compaction. */
class IncrementalSimhashBlocksSpec extends SparkSpec {
  import spark.implicits._

  test("scalar SimHashText equals the batch SimHashAgg fingerprints") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.sources.Tables(spark, dir, "documents")
      val scalarFp = docs.select(col("doc_id"),
        graft.plans.SimHashText(col("text")).as("fp"))
      val aggFp = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"))
        .agg(graft.plans.SimHashAgg(col("tok")).as("fp"))
      val diff = scalarFp.join(aggFp.withColumnRenamed("fp", "afp"), "doc_id")
        .filter(col("fp") =!= col("afp")).count()
      assert(diff == 0, s"$dir: $diff docs fingerprint differently")
    }
  }

  test("streaming pair set equals batch q38 under a shuffled multi-batch feed") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires a multi-column-family store (RocksDB)
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      for ((dir, tbl) <- Seq(
          ("/root/testdata/sf0.001", "inc_simhash_pairs_t1"),
          ("/root/testdata/sf0.01", "inc_simhash_pairs_t2"))) {
        val docs = graft.sources.Tables(spark, dir, "documents")
          .select(col("doc_id").cast("long"), col("text"))
          .as[(Long, String)].collect()
        val shuffled = new scala.util.Random(dir.length).shuffle(docs.toSeq)

        val slices = shuffled.grouped(math.max(1, shuffled.size / 3)).toSeq
        val in = MemoryStream[(Long, String)]
        val ev = IncrementalSimhashBlocks.evidence(
          in.toDS().toDF("doc_id", "text"))
        val pairs = StreamEnv(spark).fromDataset(ev)
          .keyBy(_.key)
          .transformWithState(new SimhashBlockProcessor,
            TimeMode.None(), OutputMode.Update())
          .toDataset
        val q = pairs.writeStream.format("memory").queryName(tbl)
          .outputMode(OutputMode.Update).start()
        try {
          slices.foreach { s => in.addData(s); q.processAllAvailable() }
          // at-least-once replay: re-feed the first slice — the state
          // already holds these docs; compaction must absorb the
          // re-emissions without inventing or losing a pair
          in.addData(slices.head); q.processAllAvailable()
        } finally q.stop()

        val got = IncrementalSimhashBlocks.compact(spark.table(tbl))
          .as[(Long, Long, Long)].collect().sorted.toSeq
        val want = SparkEntry.queries("q38_dedup_simhash")(spark, dir)
          .as[(Long, Long, Long)].collect().sorted.toSeq
        assert(got == want,
          s"$dir: streaming pair set diverges from batch q38 " +
            s"(${got.size} vs ${want.size} pairs)")
        info(s"$dir: ${want.size} pairs reproduced from a shuffled " +
          s"${slices.size + 1}-batch feed (incl. one replayed slice)")
      }
    } finally spark.conf.set(provider, prev)
  }
}
