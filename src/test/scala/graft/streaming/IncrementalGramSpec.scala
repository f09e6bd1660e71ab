package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[IncrementalGram]]: after ANY batch split of the corpus the running
  * state must equal batch q154's Gram bit-for-bit (partial addition IS
  * the aggregate's merge), the derived principal direction must equal
  * q155's, and the operator must run unchanged under a real
  * foreachBatch stream. */
class IncrementalGramSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def quantized() = graft.sources.Tables(spark, dir, "embeddings")
    .select(col("vec_id"), expr(
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))")
      .as("qv"))

  private def batchGram(): Array[Long] =
    quantized().agg(graft.plans.GramAgg(col("qv")).as("gs"))
      .head.getSeq[Long](0).toArray

  test("streamed Gram equals batch q154 under any batch split") {
    val want = batchGram()
    val rows = quantized().as[(Long, Seq[Long])].collect().toSeq
    for (nBatches <- Seq(1, 3, 7)) {
      val ig = new IncrementalGram
      rows.grouped((rows.size + nBatches - 1) / nBatches)
        .foreach(b => ig.update(
          b.toDF("vec_id", "qv").repartition(4), "qv"))
      assert(ig.total == rows.size.toLong, s"nBatches=$nBatches total")
      assert(java.util.Arrays.equals(ig.gram, want),
        s"nBatches=$nBatches gram diverged from batch")
    }
  }

  test("derived principal direction equals q155's") {
    val rows = quantized().as[(Long, Seq[Long])].collect().toSeq
    val ig = new IncrementalGram
    rows.grouped(170).foreach(b => ig.update(b.toDF("vec_id", "qv"), "qv"))
    val p = ig.principal(3)
    val want = graft.plans.GramAgg.principal(batchGram(), 64, 3)
    assert(java.util.Arrays.equals(p, want))
    // and the per-vector projections under the streamed direction match
    // the q155 query's output on the same dir
    val proj = quantized()
      .select(col("vec_id"), expr(
        s"aggregate(zip_with(qv, array(${p.mkString(",")}), " +
          "(x, y) -> x * y), 0L, (a, b) -> a + b)").as("proj"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q155 = graft.SparkEntry.queries("q155_pca_power")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(proj == q155)
  }

  test("runs under a real foreachBatch stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Long])]
    val ig = new IncrementalGram
    val q = in.toDS().toDF("vec_id", "qv").writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        ig.update(b, "qv")
      }
      .start()
    val rows = quantized().as[(Long, Seq[Long])].collect().toSeq
    try {
      rows.grouped(200).foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()
    assert(java.util.Arrays.equals(ig.gram, batchGram()))
    assert(ig.total == rows.size.toLong)
  }
}
