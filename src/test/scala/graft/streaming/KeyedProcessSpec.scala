package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** KeyedProcessFunction adapter (SURVEY §2.2 Plumbing row): per-key
  * ValueState mutation on each element, plus a processing-time timer
  * (reference contract: KeyedProcessFunction.java:52-125, timer firing
  * InternalTimerServiceImpl.java:183-201).
  *
  * NB: queries with ProcessingTimeTimeout run no-data batches forever, so
  * these tests poll the sink (SparkSpec.awaitTable) instead of calling
  * processAllAvailable.
  */
class KeyedProcessSpec extends SparkSpec {
  import spark.implicits._

  test("per-key ValueState accumulates across microbatches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Int)]
    val proc = new KeyedProcess[String, (String, Int), Int, (String, Int)] {
      def processElement(key: String, v: (String, Int), ctx: Ctx[Int]) = {
        val acc = ctx.value.getOrElse(0) + v._2
        ctx.update(acc)
        Seq((key, acc))
      }
    }
    val out = StreamEnv(spark).fromDataset(in.toDS())
      .keyBy(_._1)
      .process(proc)
      .toDataset
    val q = out.writeStream.format("memory").queryName("kp_out")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(("a", 1), ("b", 10))
      awaitTable("kp_out")(_.length >= 2)
      in.addData(("a", 2))
      val rows = awaitTable("kp_out")(_.length >= 3)
        .map(r => (r.getString(0), r.getInt(1))).toSet
      assert(rows == Set(("a", 1), ("b", 10), ("a", 3)))
    } finally q.stop()
  }

  test("processing-time timer fires onTimer after idle timeout") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Int)]
    // emits nothing per element; onTimer flushes the buffered count
    val proc = new KeyedProcess[String, (String, Int), Int, (String, Int)] {
      def processElement(key: String, v: (String, Int), ctx: Ctx[Int]) = {
        ctx.update(ctx.value.getOrElse(0) + v._2)
        ctx.registerTimer(500) // 500 ms processing-time timer
        Nil
      }
      override def onTimer(key: String, ctx: Ctx[Int]) =
        Seq((key, ctx.value.getOrElse(0)))
    }
    val out = StreamEnv(spark).fromDataset(in.toDS())
      .keyBy(_._1)
      .process(proc)
      .toDataset
    val q = out.writeStream.format("memory").queryName("kp_timer")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(("a", 1), ("a", 2))
      // the timer fires on a subsequent (no-data) batch once 500 ms pass
      val rows = awaitTable("kp_timer")(_.nonEmpty)
        .map(r => (r.getString(0), r.getInt(1))).toSet
      assert(rows == Set(("a", 3)))
    } finally q.stop()
  }

  test("onTimer may keep state and re-arm: the periodic-flush pattern") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Int)]
    // onTimer emits a tick, increments state, re-arms the timer: the
    // facade must NOT wipe the key after a callback that touched state
    // (the reference's timer contract allows periodic timers)
    val proc = new KeyedProcess[String, (String, Int), Int, (String, Int)] {
      def processElement(key: String, v: (String, Int), ctx: Ctx[Int]) = {
        ctx.update(v._2)
        ctx.registerTimer(300)
        Nil
      }
      override def onTimer(key: String, ctx: Ctx[Int]) = {
        val n = ctx.value.getOrElse(0)
        ctx.update(n + 1)
        ctx.registerTimer(300) // re-arm
        Seq((key, n))
      }
    }
    val out = StreamEnv(spark).fromDataset(in.toDS())
      .keyBy(_._1).process(proc).toDataset
    val q = out.writeStream.format("memory").queryName("kp_rearm")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(("a", 7))
      // at least two ticks prove the re-armed timer fired again AND the
      // state survived the first onTimer (7 then 8, not 7 then 0/1)
      val rows = awaitTable("kp_rearm")(_.length >= 2)
        .map(r => (r.getString(0), r.getInt(1))).sortBy(_._2)
      assert(rows.take(2).toSeq == Seq(("a", 7), ("a", 8)))
    } finally q.stop()
  }
}
