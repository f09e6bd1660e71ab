package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** [[IncrementalKneserNey]]: after ANY batch split of the corpus the
  * compacted count table must derive batch q180's model row for row
  * (keyed-state addition IS the batch aggregate's merge; the derivation
  * is the SHARED knFromCounts), per-batch emissions must stay
  * proportional to the batch (never the corpus — the driver-map hazard
  * this twin's rewrite retired), and a stop/restart from the engine
  * checkpoint must resume the counts exactly. */
class IncrementalKneserNeySpec extends SparkSpec {
  import spark.implicits._
  import IncrementalKneserNey.CountUpdate
  import IncrementalKneserNeySpec.KnRow

  private val dir = "/root/testdata/sf0.001"

  private def docs(): Seq[(Long, String)] =
    graft.sources.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq

  private lazy val batchModel: Set[KnRow] =
    graft.SparkEntry.queries("q180_kneser_ney")(spark, dir)
      .as[KnRow].collect().toSet

  private def withRocks[T](body: => T): T = {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body finally spark.conf.set(provider, prev)
  }

  private def modelOf(updates: Seq[CountUpdate]): Set[KnRow] = {
    val tbl = IncrementalKneserNey.table(
      updates.toDF("w1", "w2", "c")).persist()
    try IncrementalKneserNey.modelFrom(tbl, minC = 5L)
      .as[KnRow].collect().toSet
    finally tbl.unpersist(blocking = false)
  }

  test("streamed counts derive batch q180's model under any batch split") {
    assert(batchModel.nonEmpty)
    for (nBatches <- Seq(1, 4, 9)) withRocks {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(Long, String)]
      val name = s"kn_updates_$nBatches"
      val q = IncrementalKneserNey.counts(
          IncrementalKneserNey.bigrams(in.toDS().toDF("doc_id", "text"),
            "text"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      val all = docs()
      val batches = all.grouped((all.size + nBatches - 1) / nBatches).toSeq
      val perBatchRows = try {
        batches.map { b =>
          in.addData(b); q.processAllAvailable()
          spark.table(name).count()
        }
      } finally q.stop()
      val updates = spark.table(name).as[CountUpdate].collect().toSeq
      assert(modelOf(updates) == batchModel,
        s"nBatches=$nBatches model diverged from batch q180")
      // the exact emission contract: a batch emits one row per (w1,w2)
      // IT TOUCHED — never the accumulated table. Comparing against the
      // total (the old `< updates.length` form) was vacuous: a
      // re-emit-everything regression still satisfies it whenever two
      // batches emit at all (r11 self-review catch).
      val increments = perBatchRows.zip(0L +: perBatchRows).map {
        case (cur, prev) => cur - prev
      }
      val touched = batches.map(_.flatMap { case (_, text) =>
        // mirror bigrams() exactly: Spark's split keeps empty tokens
        // (hence limit -1), and there is no empty-token filter there
        val ws = text.split(" ", -1)
        if (ws.length < 2) Nil else ws.sliding(2).map(p => (p(0), p(1))).toSeq
      }.distinct.size.toLong)
      assert(increments == touched,
        s"nBatches=$nBatches per-batch emissions $increments != " +
          s"per-batch touched bigrams $touched - a batch re-emitted state")
    }
  }

  test("stop/restart resumes the counts from the engine checkpoint") {
    withRocks {
      val srcDir = java.nio.file.Files
        .createTempDirectory("graft_kn_src").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_kn_ckpt").toString
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_kn_out").toString
      def startQuery() = IncrementalKneserNey.counts(
          IncrementalKneserNey.bigrams(
            spark.readStream.schema("doc_id LONG, text STRING")
              .parquet(srcDir), "text"))
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[CountUpdate], _: Long) =>
            batch.write.mode(org.apache.spark.sql.SaveMode.Append)
              .parquet(outDir)
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .start()
      val all = docs()
      val (firstHalf, rest) = all.splitAt(all.size / 2)
      firstHalf.toDF("doc_id", "text").write
        .mode(org.apache.spark.sql.SaveMode.Append).parquet(srcDir)
      val q1 = startQuery()
      q1.processAllAvailable(); q1.stop()
      // a LOST state would restart every resumed bigram at its batch-2
      // delta; the max-compaction would then under-count exactly the
      // bigrams straddling the restart
      rest.toDF("doc_id", "text").write
        .mode(org.apache.spark.sql.SaveMode.Append).parquet(srcDir)
      val q2 = startQuery()
      q2.processAllAvailable(); q2.stop()
      val updates = spark.read.parquet(outDir).as[CountUpdate]
        .collect().toSeq
      assert(modelOf(updates) == batchModel,
        "checkpoint restart diverged from the batch model")
    }
  }
}

object IncrementalKneserNeySpec {
  /** One scored bigram — q180's output row (top-level for the encoder). */
  final case class KnRow(w1: String, w2: String, c: Long, cw1: Long,
      n1w1: Long, ncont: Long, kn_num: Long, kn_den: Long)
}
