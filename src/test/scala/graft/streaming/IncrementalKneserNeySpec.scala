package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[IncrementalKneserNey]]: after ANY batch split of the corpus the
  * derived model must equal batch q180 row for row (count addition IS
  * the batch aggregate's merge; every other table is a pure derivation
  * of the counts), the operator must run unchanged under a real
  * foreachBatch stream, and a seeded restart from the emitted count
  * snapshot must converge to the same model. */
class IncrementalKneserNeySpec extends SparkSpec {
  import spark.implicits._
  import IncrementalKneserNey.KnRow

  private val dir = "/root/testdata/sf0.001"

  private def docs(): Seq[(Long, String)] =
    graft.sources.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq

  private lazy val batchModel: Set[KnRow] =
    graft.SparkEntry.queries("q180_kneser_ney")(spark, dir)
      .as[KnRow].collect().toSet

  test("streamed counts derive batch q180's model under any batch split") {
    assert(batchModel.nonEmpty)
    for (nBatches <- Seq(1, 4, 9)) {
      val kn = new IncrementalKneserNey
      docs().grouped((docs().size + nBatches - 1) / nBatches)
        .foreach(b => kn.update(b.toDF("doc_id", "text").repartition(4),
          "text"))
      assert(kn.model(minC = 5L).toSet == batchModel,
        s"nBatches=$nBatches model diverged from batch q180")
    }
  }

  test("runs under a real foreachBatch stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val kn = new IncrementalKneserNey
    val q = in.toDS().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        kn.update(b, "text")
      }
      .start()
    try {
      docs().grouped(120).foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()
    assert(kn.model(minC = 5L).toSet == batchModel)
  }

  test("restart re-seeded from the count snapshot converges to batch") {
    val all = docs()
    val (firstHalf, rest) = all.splitAt(all.size / 2)
    val first = new IncrementalKneserNey
    first.update(firstHalf.toDF("doc_id", "text"), "text")
    // the emitted snapshot is the recovery state: a fresh instance
    // seeded with it and fed ONLY the remaining documents must land on
    // the full-corpus model
    val snapshot = first.counts
    val resumed = new IncrementalKneserNey
    resumed.seed(snapshot)
    assert(resumed.totalOccurrences == first.totalOccurrences)
    resumed.update(rest.toDF("doc_id", "text"), "text")
    assert(resumed.model(minC = 5L).toSet == batchModel,
      "seeded restart diverged from the batch model")
    // seeding a non-empty instance must fail loudly (it would
    // double-count the snapshot's prefix)
    intercept[IllegalArgumentException] { resumed.seed(snapshot) }
  }
}
