package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Parity with the reference's only runnable workload (SURVEY §5.1):
  * flink-examples .../wordcount/WordCount.java:12-57 —
  * fromElements("hello world","hello world") → flatMap(split) →
  * filter(=="hello") → keyBy(f0) → reduce(sum) → print.
  *
  * Reference semantics (StreamGroupedReduce.java:35-55): running counts,
  * one emission per input record: (hello,1) then (hello,2).
  */
class WordCountParitySpec extends SparkSpec {
  import spark.implicits._

  test("batch wordcount: final per-key counts match the reference") {
    val env = StreamEnv(spark)
    val out = env.fromElements("hello world", "hello world")
      .flatMap(_.split("\\s"))
      .filter(_ == "hello")
      .map(w => (w, 1))
      .keyBy(_._1)
      .reduce((a, b) => (a._1, a._2 + b._2))
      .toDataset.collect().toSet
    assert(out == Set(("hello", 2)))
  }

  test("streaming wordcount: per-record update-mode emission sequence") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val env = StreamEnv(spark)
    val counts = env.fromDataset(in.toDS())
      .flatMap(_.split("\\s"))
      .filter(_ == "hello")
      .map(w => (w, 1))
      .keyBy(_._1)
      .reduce((a, b) => (a._1, a._2 + b._2))
      .toDataset

    val q = counts.writeStream
      .format("memory").queryName("wc_out")
      .outputMode(OutputMode.Update)
      .start()
    try {
      in.addData("hello world", "hello world")
      q.processAllAvailable()
      val rows = spark.table("wc_out").as[(String, Int)].collect().toSeq
      // one output per input record, running totals in arrival order
      assert(rows == Seq(("hello", 1), ("hello", 2)))

      in.addData("hello again")
      q.processAllAvailable()
      val rows2 = spark.table("wc_out").as[(String, Int)].collect().toSeq
      assert(rows2 == Seq(("hello", 1), ("hello", 2), ("hello", 3)))
    } finally q.stop()
  }
}
