package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Operator-level checks for [[GlobalIndex]]: the ordinals must be a
  * bijection onto 0..N-1 that follows the requested total order, stable
  * across input partitioning (q73's oracle pins the corpus result; this
  * pins the contract on adversarial shapes — duplicates in non-key
  * columns, skewed input splits). */
class GlobalIndexSpec extends SparkSpec {
  import spark.implicits._

  private val rows = {
    val rnd = new scala.util.Random(11)
    // unique key (k1, k2); payload collides on purpose
    rnd.shuffle(List.tabulate(997)(i => (i % 13, i, s"p${i % 7}")))
  }

  test("ordinals are 0..N-1 in sort order, regardless of input splits") {
    for (parts <- Seq(1, 3, 16)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts))
        .toDF("k1", "k2", "payload")
      val got = GlobalIndex.assign(df, Seq(col("k1"), col("k2")))
        .select(col("k1"), col("k2"), col("seq_id"))
        .as[(Int, Int, Long)].collect().sortBy(_._3)
      assert(got.map(_._3).toSeq == (0L until rows.size).toSeq)
      val expect = rows.map(r => (r._1, r._2)).sorted
      assert(got.map(t => (t._1, t._2)).toSeq == expect)
    }
  }

  test("shuffles the data exactly once across the count and stamp jobs") {
    // The count job materializes the range shuffle; the stamping job must
    // re-read its map output, not re-shuffle (at 100 TB a second exchange
    // of the corpus is the difference between 1x and 2x the dominant
    // cost). Counted behaviorally: exactly one completed stage may write
    // shuffle records across BOTH jobs.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val writes = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (sc.stageInfo.taskMetrics != null &&
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten > 0)
          writes.incrementAndGet()
    }
    val df = spark.range(0, 50000)
      .selectExpr("id % 97 AS k1", "id AS k2", "repeat('x', 50) AS payload")
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = GlobalIndex.assign(df, Seq(col("k1"), col("k2")))
      // runFully (per-partition fold) executes the plan without adding a
      // shuffle of its own, unlike count()'s final aggregate exchange
      assert(graft.Sessions.runFully(out) == 50000)
      // listener bus is async (and private): wait until the expected
      // terminal state is reached (or the deadline), then a fixed grace
      // period so a straggling SECOND shuffle event would still be seen
      val deadline = System.nanoTime() + 10_000_000_000L
      while (System.nanoTime() < deadline && writes.get() < 1)
        Thread.sleep(100)
      Thread.sleep(1500)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(writes.get() == 1, s"expected 1 shuffle-writing stage, saw ${writes.get()}")
  }

  test("appends the column without disturbing existing ones") {
    val df = Seq((2, "b"), (1, "a"), (3, "c")).toDF("k", "v")
    val out = GlobalIndex.assign(df, Seq(col("k")), outCol = "idx")
    assert(out.columns.toSeq == Seq("k", "v", "idx"))
    assert(out.orderBy("idx").as[(Int, String, Long)].collect().toSeq ==
      Seq((1, "a", 0L), (2, "b", 1L), (3, "c", 2L)))
  }
}
