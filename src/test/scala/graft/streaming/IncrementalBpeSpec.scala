package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** [[IncrementalBpe]]: after ANY batch split of the corpus the compacted
  * histogram must derive batch q130's merge table row for row AND q149's
  * per-document encode stats exactly (keyed-state addition IS the batch
  * aggregate's merge; the derivation is the SHARED bpeTrainFromHist),
  * per-batch emissions must stay proportional to the batch (never the
  * corpus — the driver-map-with-cap this twin's rewrite retired), and a
  * stop/restart from the engine checkpoint must resume the counts
  * exactly. */
class IncrementalBpeSpec extends SparkSpec {
  import spark.implicits._
  import IncrementalBpe.CountUpdate

  private val dir = "/root/testdata/sf0.001"
  private val Rounds = 4 // TextOps.BpeRounds (private; q130 runs 4)

  private def docs(): Seq[(Long, String)] =
    graft.sources.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq

  private lazy val batchMerges: Seq[(Long, String, String, Long)] =
    graft.SparkEntry.queries("q130_bpe_merges")(spark, dir)
      .as[(Long, String, String, Long)].collect().toSeq

  private lazy val batchEncode: Map[Long, (Long, Long)] =
    graft.SparkEntry.queries("q149_bpe_encode")(spark, dir)
      .select(col("doc_id"), col("n_words"), col("n_pieces"))
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap

  private def withRocks[T](body: => T): T = {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body finally spark.conf.set(provider, prev)
  }

  /** Merge table + encode stats derived from an accumulated update
    * stream through the twin's own compaction and shared fold. */
  private def modelOf(updates: Seq[CountUpdate])
      : (Seq[(Long, String, String, Long)], Map[Long, (Long, Long)]) = {
    val hist = IncrementalBpe.table(updates.toDF("word", "n")).persist()
    try {
      val (mergeFrames, vocabFrame) = IncrementalBpe.model(hist, Rounds)
      val merges = mergeFrames.map(_.select(col("round"), col("lhs"),
          col("rhs"), col("c")).as[(Long, String, String, Long)].head())
      val vocab = vocabFrame.select(col("word"), col("repr"))
        .as[(String, String)].collect().toMap
      val enc = docs().map { case (id, text) =>
        val ws = text.split(" ").filter(_.nonEmpty)
        id -> (ws.length.toLong,
          ws.map(w => vocab(w).split(" ").length.toLong).sum)
      }.toMap
      (merges, enc)
    } finally hist.unpersist(blocking = false)
  }

  test("streamed counts derive batch q130/q149 under any batch split") {
    assert(batchMerges.size == Rounds && batchEncode.nonEmpty)
    for (nBatches <- Seq(1, 3, 8)) withRocks {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(Long, String)]
      val name = s"bpe_updates_$nBatches"
      val q = IncrementalBpe.counts(
          IncrementalBpe.words(in.toDS().toDF("doc_id", "text"), "text"))
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
      val (merges, enc) = modelOf(updates)
      assert(merges == batchMerges,
        s"nBatches=$nBatches merge table diverged:\n$merges\nvs\n$batchMerges")
      assert(enc == batchEncode,
        s"nBatches=$nBatches encode stats diverged from q149")
      // the exact emission contract: a batch emits one row per word IT
      // TOUCHED — never the accumulated histogram. Comparing against
      // the total (the old `< updates.length` form) was vacuous: a
      // re-emit-everything regression still satisfies it whenever two
      // batches emit at all (r11 self-review catch).
      val increments = perBatchRows.zip(0L +: perBatchRows).map {
        case (cur, prev) => cur - prev
      }
      val touched = batches.map(
        _.flatMap(_._2.split(" ")).filter(_.nonEmpty).distinct.size.toLong)
      assert(increments == touched,
        s"nBatches=$nBatches per-batch emissions $increments != " +
          s"per-batch touched words $touched - a batch re-emitted state")
    }
  }

  test("stop/restart resumes the counts from the engine checkpoint") {
    withRocks {
      val srcDir = java.nio.file.Files
        .createTempDirectory("graft_bpe_src").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_bpe_ckpt").toString
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_bpe_out").toString
      def startQuery() = IncrementalBpe.counts(
          IncrementalBpe.words(
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
      // a LOST state would restart every resumed word at its batch-2
      // delta; the max-compaction would then under-count exactly the
      // words straddling the restart
      rest.toDF("doc_id", "text").write
        .mode(org.apache.spark.sql.SaveMode.Append).parquet(srcDir)
      val q2 = startQuery()
      q2.processAllAvailable(); q2.stop()
      val updates = spark.read.parquet(outDir).as[CountUpdate]
        .collect().toSeq
      val (merges, enc) = modelOf(updates)
      assert(merges == batchMerges,
        "checkpoint restart diverged from the batch merge table")
      assert(enc == batchEncode,
        "checkpoint restart diverged from the batch encode stats")
    }
  }
}
