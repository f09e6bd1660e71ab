package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[IncrementalBpe]]: after ANY batch split of the corpus the replayed
  * training must equal batch q130's merge table row for row AND derive
  * q149's per-document encode stats exactly (the histogram is the
  * training's whole input, and addition is the batch aggregate's
  * merge); plus the foreachBatch and seeded-restart contracts of the
  * twin family. The driver replay is an independent implementation of
  * the merge fold, so this differential cross-checks it against the
  * distributed one. */
class IncrementalBpeSpec extends SparkSpec {
  import spark.implicits._

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

  /** q149's per-doc stats derived from a twin vocabulary. */
  private def encodeWith(vocab: Map[String, String])
      : Map[Long, (Long, Long)] =
    docs().map { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      id -> (ws.length.toLong,
        ws.map(w => vocab(w).split(" ").length.toLong).sum)
    }.toMap

  test("replayed training equals batch q130/q149 under any batch split") {
    assert(batchMerges.size == Rounds && batchEncode.nonEmpty)
    for (nBatches <- Seq(1, 3, 8)) {
      val bpe = new IncrementalBpe
      docs().grouped((docs().size + nBatches - 1) / nBatches)
        .foreach(b => bpe.update(b.toDF("doc_id", "text").repartition(4),
          "text"))
      val (merges, vocab) = bpe.model(Rounds)
      assert(merges == batchMerges,
        s"nBatches=$nBatches merge table diverged:\n$merges\nvs\n$batchMerges")
      assert(encodeWith(vocab) == batchEncode,
        s"nBatches=$nBatches encode stats diverged from q149")
    }
  }

  test("runs under a real foreachBatch stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val bpe = new IncrementalBpe
    val q = in.toDS().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        bpe.update(b, "text")
      }
      .start()
    try {
      docs().grouped(150).foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()
    assert(bpe.model(Rounds)._1 == batchMerges)
  }

  test("restart re-seeded from the histogram snapshot converges to batch") {
    val all = docs()
    val (firstHalf, rest) = all.splitAt(all.size / 2)
    val first = new IncrementalBpe
    first.update(firstHalf.toDF("doc_id", "text"), "text")
    val resumed = new IncrementalBpe
    resumed.seed(first.counts)
    assert(resumed.totalWords == first.totalWords)
    resumed.update(rest.toDF("doc_id", "text"), "text")
    assert(resumed.model(Rounds)._1 == batchMerges,
      "seeded restart diverged from the batch merge table")
    intercept[IllegalArgumentException] { resumed.seed(first.counts) }
  }

  test("the distinct-word cap fails loudly before anything is collected") {
    val capped = new IncrementalBpe(maxDistinctWords = 3L)
    val wide = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val err = intercept[IllegalArgumentException] {
      capped.update(wide, "text")
    }
    assert(err.getMessage.contains("maxDistinctWords"))
    assert(capped.distinctWords == 0L && capped.totalWords == 0L,
      "a rejected batch must leave the histogram untouched")
    // under the cap the same instance still absorbs normally
    capped.update(Seq((2L, "a b a")).toDF("doc_id", "text"), "text")
    assert(capped.distinctWords == 2L && capped.totalWords == 3L)
    // an oversized snapshot is rejected at seed time too
    val fresh = new IncrementalBpe(maxDistinctWords = 1L)
    intercept[IllegalArgumentException] {
      fresh.seed(Seq(("a", 1L), ("b", 1L)))
    }
  }
}
