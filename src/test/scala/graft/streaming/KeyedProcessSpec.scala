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

  test("keyed side outputs, batch: one stateful pass feeds both channels") {
    // stateful validator: per-key running sum; a record that pushes its
    // key's sum past 10 goes to the exceptions channel, the rest emit
    // the running sum on main - the reference's ctx.output(tag, v)
    // shape from INSIDE a keyed processor
    val passes = spark.sparkContext.longAccumulator("kp_tagged_passes")
    val proc = new KeyedProcessTagged[String, (String, Int), Int,
        (String, Int), String] {
      def processElement(key: String, v: (String, Int), ctx: Ctx[Int]) = {
        val acc = ctx.value.getOrElse(0) + v._2
        ctx.update(acc)
        if (acc > 10) Seq(Left(s"$key over limit at $acc"))
        else Seq(Right((key, acc)))
      }
    }
    val in = spark.createDataset(Seq(
      ("a", 1), ("a", 2), ("b", 9), ("b", 5), ("a", 20)))
      .map { v => passes.add(1); v }
    val (mains, sides) = StreamEnv(spark).fromDataset(in)
      .keyBy(_._1)
      .processTagged(proc)
      .scoped { (main, side) =>
        (main.toDataset.collect().toSet, side.toDataset.collect().toSet)
      }
    assert(mains == Set(("a", 1), ("a", 3), ("b", 9)))
    assert(sides == Set("b over limit at 14", "a over limit at 23"))
    // ONE pass: the stateful fold consumed each source record exactly
    // once even though both channels ran their own collect()
    assert(passes.value == 5L,
      s"expected 5 source reads for one pass, saw ${passes.value}")
  }

  test("keyed side outputs, streaming: dual-writer routes both channels") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Int)]
    val proc = new KeyedProcessTagged[String, (String, Int), Int,
        (String, Int), String] {
      def processElement(key: String, v: (String, Int), ctx: Ctx[Int]) = {
        val acc = ctx.value.getOrElse(0) + v._2
        ctx.update(acc)
        if (acc > 10) Seq(Left(s"$key over limit at $acc"))
        else Seq(Right((key, acc)))
      }
    }
    val mains = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int)]
    val sides = new java.util.concurrent.ConcurrentLinkedQueue[String]
    // NoTimeout: this processor uses no timers, and a ProcessingTimeTimeout
    // query runs no-data batches forever (processAllAvailable never returns)
    val q = StreamEnv(spark).fromDataset(in.toDS())
      .keyBy(_._1)
      .processTagged(proc,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .foreach(
        m => m.collect().foreach(mains.add),
        s => s.collect().foreach(sides.add))
      .outputMode(OutputMode.Update)
      .start()
    try {
      in.addData(("a", 4), ("b", 12))
      q.processAllAvailable()
      in.addData(("a", 9))
      q.processAllAvailable()
      assert(mains.toArray.toSet == Set(("a", 4)))
      assert(sides.toArray.toSet ==
        Set("b over limit at 12", "a over limit at 13"))
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
