package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.{SparkEntry, SparkSpec}

/** Verdict-equality between the streaming incremental-ingest dedup and
  * batch q80: the corpus (nib <= 13) flows in as admitted batches, the
  * ingest split (nib >= 14) as probe batches, and every probe doc must
  * get exactly the status the batch query assigns it. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("streaming verdicts equal batch q80 on the sf0.01 corpus") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires a multi-column-family store (RocksDB)
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val docs = graft.sources.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        (instr(lit("0123456789abcdef"),
          substring(md5(col("doc_id").cast("string")), 1, 1)) - 1).as("nib"))
      .as[(Long, String, Long)].collect()
    val corpus = docs.filter(_._3 <= 13)
    val ingest = docs.filter(_._3 >= 14)

    val in = MemoryStream[(Long, String, Boolean)]
    val ev = IncrementalDedup.evidence(
      in.toDS().toDF("doc_id", "text", "admit"))
    val hits = StreamEnv(spark).fromDataset(ev)
      .keyBy(_.key)
      .transformWithState(new IncrementalDedupProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDataset
    val q = hits.writeStream.format("memory").queryName("inc_dedup_hits")
      .outputMode(OutputMode.Update).start()
    try {
      // corpus admitted across two micro-batches (state accumulates),
      // then the ingest probes across two more — admissions are visible
      // to all following batches
      val (c1, c2) = corpus.splitAt(corpus.length / 2)
      val (i1, i2) = ingest.splitAt(ingest.length / 2)
      in.addData(c1.map(d => (d._1, d._2, true)).toSeq); q.processAllAvailable()
      in.addData(c2.map(d => (d._1, d._2, true)).toSeq); q.processAllAvailable()
      in.addData(i1.map(d => (d._1, d._2, false)).toSeq); q.processAllAvailable()
      in.addData(i2.map(d => (d._1, d._2, false)).toSeq); q.processAllAvailable()
    } finally q.stop()

    val got = IncrementalDedup.verdicts(spark.table("inc_dedup_hits"))
      .as[(Long, String)].collect().sorted.toSeq
    val want = SparkEntry.queries("q80_incremental_ingest")(spark, dir)
      .as[(Long, String)].collect().sorted.toSeq
    assert(got.size == ingest.length)
    assert(got == want)
    } finally spark.conf.set(provider, prev)
  }
}
