package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming._

import graft.SparkSpec

/** transformWithState path (SURVEY §2.6): the reference's full keyed-state
  * surface — ValueState + the ListState the reference cut — on Spark 4's
  * StatefulProcessor with the RocksDB state store. */
class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._

  test("ValueState + ListState accumulate across batches on RocksDB") {
    implicit val sqlCtx = spark.sqlContext
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(String, Int)]
      val out = StreamEnv(spark).fromDataset(in.toDS())
        .keyBy(_._1)
        .transformWithState(new SumWithHistory,
          TimeMode.None(), OutputMode.Update())
        .toDataset
      val q = out.writeStream.format("memory").queryName("tws_out")
        .outputMode(OutputMode.Update).start()
      try {
        in.addData(("a", 1), ("b", 10))
        q.processAllAvailable()
        in.addData(("a", 2))
        q.processAllAvailable()
        val rows = spark.table("tws_out").as[(String, Int, Int)].collect().toSet
        // (key, running sum, history length)
        assert(rows == Set(("a", 1, 1), ("b", 10, 1), ("a", 3, 2)))
      } finally q.stop()
    } finally spark.conf.set(provider, prev)
  }
}

/** Running sum via ValueState + history of inputs via ListState.
  * Top-level so the closure serializes without the spec instance. */
class SumWithHistory
    extends StatefulProcessor[String, (String, Int), (String, Int, Int)] {
  @transient private var sum: ValueState[Int] = _
  @transient private var hist: ListState[Int] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    sum = getHandle.getValueState[Int]("sum", Encoders.scalaInt,
      TTLConfig.NONE)
    hist = getHandle.getListState[Int]("hist", Encoders.scalaInt,
      TTLConfig.NONE)
  }
  override def handleInputRows(key: String, rows: Iterator[(String, Int)],
      timerValues: TimerValues): Iterator[(String, Int, Int)] = {
    rows.map { r =>
      val s = (if (sum.exists()) sum.get() else 0) + r._2
      sum.update(s)
      hist.appendValue(r._2)
      (key, s, hist.get().length)
    }
  }
}
