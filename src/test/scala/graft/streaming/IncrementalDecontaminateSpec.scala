package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** [[IncrementalDecontaminate]]: the compacted hit report must equal
  * batch q218 whenever the stream's knowledge is complete (one batch;
  * or every test doc before every train doc), same-batch contamination
  * must flag regardless of row order, the seen-so-far semantics must
  * NOT flag a train doc that precedes its contaminating test doc, and
  * a stop/restart from the engine checkpoint must resume the gram set
  * exactly. */
class IncrementalDecontaminateSpec extends SparkSpec {
  import spark.implicits._
  import IncrementalDecontaminate.Hit

  private val dir = "/root/testdata/sf0.001"

  private def docs(): Seq[(Long, String)] =
    graft.sources.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq

  private def nib(id: Long): Int =
    "0123456789abcdef".indexOf(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString)(0))

  private lazy val batchReport: Set[(Long, Long)] =
    graft.SparkEntry.queries("q218_decontaminate_ac")(spark, dir)
      .as[(Long, Long)].collect().toSet

  private def withRocks[T](body: => T): T = {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body finally spark.conf.set(provider, prev)
  }

  private def reportOf(hits: Seq[Hit]): Set[(Long, Long)] =
    IncrementalDecontaminate.report(hits.toDF("train_id", "g"))
      .as[(Long, Long)].collect().toSet

  private def streamReport(batches: Seq[Seq[(Long, String)]],
      name: String): Set[(Long, Long)] = withRocks {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = IncrementalDecontaminate.hits(
        IncrementalDecontaminate.grams(in.toDS().toDF("doc_id", "text"),
          "doc_id", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try batches.foreach { b => in.addData(b); q.processAllAvailable() }
    finally q.stop()
    reportOf(spark.table(name).as[Hit].collect().toSeq)
  }

  test("one batch equals batch q218; test-first batching equals it too") {
    assert(batchReport.nonEmpty)
    val all = docs()
    assert(streamReport(Seq(all), "deco_one") == batchReport)
    // every test doc first, then train docs in 3 batches: the stream's
    // knowledge is complete before any probe, so the gate = the batch
    val (test, rest) = all.partition(d => nib(d._1) >= 14)
    val trainBatches = rest.grouped((rest.size + 2) / 3).toSeq
    assert(streamReport(test +: trainBatches, "deco_split") == batchReport)
  }

  test("seen-so-far semantics: a train doc before its test doc is not flagged") {
    val all = docs()
    val (test, rest) = all.partition(d => nib(d._1) >= 14)
    // train docs FIRST, eval set after: nothing can be flagged at probe
    // time, and test-doc arrival must not retro-emit
    val got = streamReport(Seq(rest, test), "deco_late")
    assert(got.isEmpty,
      s"train-before-test run flagged ${got.size} docs — the gate " +
        "retro-emitted on test arrival")
  }

  test("stop/restart resumes the gram set from the engine checkpoint") {
    withRocks {
      val srcDir = java.nio.file.Files
        .createTempDirectory("graft_deco_src").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_deco_ckpt").toString
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_deco_out").toString
      def startQuery() = IncrementalDecontaminate.hits(
          IncrementalDecontaminate.grams(
            spark.readStream.schema("doc_id LONG, text STRING")
              .parquet(srcDir), "doc_id", "text"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Hit], _: Long) =>
          batch.write.mode(org.apache.spark.sql.SaveMode.Append)
            .parquet(outDir)
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .start()
      val all = docs()
      val (test, rest) = all.partition(d => nib(d._1) >= 14)
      // eval set in run 1; train docs in run 2 — lost state would
      // probe an empty gram set and flag nothing
      test.toDF("doc_id", "text").write
        .mode(org.apache.spark.sql.SaveMode.Append).parquet(srcDir)
      val q1 = startQuery()
      q1.processAllAvailable(); q1.stop()
      rest.toDF("doc_id", "text").write
        .mode(org.apache.spark.sql.SaveMode.Append).parquet(srcDir)
      val q2 = startQuery()
      q2.processAllAvailable(); q2.stop()
      val hits = spark.read.parquet(outDir).as[Hit].collect().toSeq
      assert(reportOf(hits) == batchReport,
        "checkpoint restart diverged from the batch report")
    }
  }
}
