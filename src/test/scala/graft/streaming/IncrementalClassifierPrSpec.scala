package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.{SparkEntry, SparkSpec}

/** Operating-point equality between the streaming monitor and batch
  * q227: the batch curve picks the quartile thresholds offline, the
  * sf0.001 documents then stream in as interleaved micro-batches, and
  * each threshold's LAST emission must carry exactly the batch query's
  * (n_pred, tp, precision_ppm, recall_ppm, f1_ppm) — the ppm integer
  * arithmetic is shared, so equality is bitwise, not approximate. */
class IncrementalClassifierPrSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming operating point equals batch q227 after the last batch") {
    implicit val sqlCtx = spark.sqlContext
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batch = SparkEntry.queries("q227_classifier_pr")(spark, dir)
        .select(col("quartile"), col("thr_si"), col("n_pred"), col("tp"),
          col("precision_ppm"), col("recall_ppm"), col("f1_ppm"))
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      val thresholds = batch.map(r => r._1 -> r._2).toMap
      assert(thresholds.size == 3, "q227 must yield 3 quartile thresholds")

      val docs = graft.sources.Tables(spark, dir, "documents")
      val all = IncrementalClassifierPr.observations(docs, thresholds)
        .collect().toSeq
      val batches = (0 until 3).map(i => all.zipWithIndex
        .collect { case (o, j) if j % 3 == i => o })

      val in = MemoryStream[IncrementalClassifierPr.PrObs]
      val pts = StreamEnv(spark).fromDataset(in.toDS())
        .keyBy(_.q)
        .transformWithState(new IncrementalClassifierPrProcessor(thresholds),
          TimeMode.None(), OutputMode.Update())
        .toDataset
      val q = pts.writeStream.format("memory").queryName("inc_pr")
        .outputMode(OutputMode.Update).start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
      } finally q.stop()

      // last emission per threshold = the one having absorbed all docs
      // (counters only grow; ties are rows identical to the final one)
      val got = spark.table("inc_pr")
        .groupBy(col("q"))
        .agg(max_by(
          struct(col("thrSi"), col("nPred"), col("tp"),
            col("precisionPpm"), col("recallPpm"), col("f1Ppm")),
          struct(col("nPos"), col("nPred"), col("tp"))).as("s"))
        .select(col("q"), col("s.thrSi"), col("s.nPred"), col("s.tp"),
          col("s.precisionPpm"), col("s.recallPpm"), col("s.f1Ppm"))
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet

      assert(got == batch.toSet,
        "final streaming operating points must equal batch q227")
    } finally spark.conf.set(provider, prev)
  }
}
