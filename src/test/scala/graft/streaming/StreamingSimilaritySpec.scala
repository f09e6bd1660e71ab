package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.{SparkEntry, SparkSpec}

/** Top-k equality between the streaming LSH similarity search and batch
  * q41: the corpus flows in as admitted batches (building the band index
  * in keyed state), the query vectors (vec_id % 50 = 0, q41's query set)
  * as probe batches, and every query's top-5 — after the same DISTINCT
  * the batch plan applies — must equal the batch result bit-for-bit,
  * doubles included. */
class StreamingSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("streaming top-k equals batch q41 on the sf0.01 corpus") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires a multi-column-family store (RocksDB)
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val vecs = graft.sources.Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect()
      val queries = vecs.filter(_._1 % 50 == 0)

      val in = MemoryStream[(Long, Array[Float], Boolean)]
      val ev = StreamingSimilarity.evidence(
        in.toDS().toDF("vec_id", "embedding", "admit"))
      val cands = StreamEnv(spark).fromDataset(ev)
        .keyBy(_.key)
        .transformWithState(new StreamingSimilarityProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDataset
      val q = cands.writeStream.format("memory").queryName("stream_sim")
        .outputMode(OutputMode.Update).start()
      try {
        // the full corpus (queries included — they are corpus members in
        // q41) indexed across two micro-batches, then the probes
        val (c1, c2) = vecs.splitAt(vecs.length / 2)
        in.addData(c1.map(v => (v._1, v._2, true)).toSeq)
        q.processAllAvailable()
        in.addData(c2.map(v => (v._1, v._2, true)).toSeq)
        q.processAllAvailable()
        in.addData(queries.map(v => (v._1, v._2, false)).toSeq)
        q.processAllAvailable()
      } finally q.stop()

      // consumer tail = the batch plan's: DISTINCT (multi-table
      // collisions emit bit-identical rows), then top-5 per query by
      // (cos desc, id)
      val got = spark.table("stream_sim")
        .as[(Long, Long, Double)].collect().distinct
        .groupBy(_._1).toSeq.flatMap { case (qid, cs) =>
          cs.sortBy(c => (-c._3, c._2)).take(5).zipWithIndex
            .map { case ((_, nb, cos), i) => (qid, nb, i + 1, cos) }
        }.sortBy(r => (r._1, r._3))

      val want = SparkEntry.queries("q41_knn_lsh")(spark, dir)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
      assert(got.nonEmpty)
      assert(got == want)
    } finally spark.conf.set(provider, prev)
  }
}
