package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[IncrementalHeavyHitters]]: the merged summary after any batch split
  * of the stream must keep the N/(capacity+1) superset guarantee and the
  * exact total, the sketch-then-confirm answer over the accumulated
  * corpus must equal the batch pipeline's, and the operator must run
  * unchanged under a real foreachBatch stream. */
class IncrementalHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // the HeavyHittersSpec zipf stream: item i of 1..120 appears
  // ceil(600/i) times — vocab 120 >> capacity, constant evictions
  private val stream: Seq[String] =
    (1 to 120).flatMap(i => Seq.fill((600 + i - 1) / i)(s"item$i"))
  private val exact: Map[String, Long] =
    stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
  private val n = stream.size.toLong

  test("batched summaries keep the guarantee + exact total, any split") {
    val cap = 20
    val mustSurvive = exact.filter(_._2 > n / (cap + 1)).keySet
    for (nBatches <- Seq(1, 4, 9)) {
      val hh = new IncrementalHeavyHitters(cap)
      stream.grouped((stream.size + nBatches - 1) / nBatches)
        .foreach(b => hh.update(b.toDF("tok").repartition(5), "tok"))
      assert(hh.total == n, s"nBatches=$nBatches total")
      val cand = hh.candidates.map(_._1).toSet
      assert(cand.size <= cap, s"nBatches=$nBatches overflow")
      val missing = mustSurvive -- cand
      assert(missing.isEmpty,
        s"nBatches=$nBatches lost guaranteed heavy hitters: $missing")
      // every surviving counter is a valid lower bound
      hh.candidates.foreach { case (k, c) =>
        assert(c <= exact(k), s"counter for $k exceeds true count")
      }
    }
  }

  test("confirm pass over the accumulated corpus equals the batch answer") {
    val cap = 25 // threshold 1/24 ≥ 1/26: guarantee covers it
    val hh = new IncrementalHeavyHitters(cap)
    stream.grouped(700).foreach(b => hh.update(b.toDF("tok"), "tok"))
    val expect = exact.filter { case (_, c) => c * 24 >= n }
    val corpus = stream.toDF("tok")
    val got = corpus
      .join(broadcast(hh.candidates.map(_._1).toDF("tok")), "tok")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 24 >= hh.total)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("runs under a real foreachBatch stream") {
    implicit val sqlCtx = spark.sqlContext
    val cap = 20
    val in = MemoryStream[String]
    val hh = new IncrementalHeavyHitters(cap)
    val q = in.toDS().toDF("tok").writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        hh.update(b, "tok")
      }
      .start()
    try {
      stream.grouped(900).foreach { b => in.addData(b); q.processAllAvailable() }
      assert(hh.total == n)
      val mustSurvive = exact.filter(_._2 > n / (cap + 1)).keySet
      assert((mustSurvive -- hh.candidates.map(_._1).toSet).isEmpty)
    } finally q.stop()
  }
}
