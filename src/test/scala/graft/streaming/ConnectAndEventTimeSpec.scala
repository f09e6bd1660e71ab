package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.SparkSpec

/** connect/CoMap (SURVEY §2.7) and event-time timers (§2.6 timer row:
  * registerEventTimeTimer / advanceWatermark). */
class ConnectAndEventTimeSpec extends SparkSpec {
  import spark.implicits._

  test("connect: co-map two differently-typed streams into one") {
    val env = StreamEnv(spark)
    val ints = env.fromElements(1, 2)
    val strs = env.fromElements("x", "yy")
    val out = ints.connect(strs)
      .map(i => s"int:$i", s => s"str:${s.length}")
      .toDataset.collect().toSet
    assert(out == Set("int:1", "int:2", "str:1", "str:2"))
  }

  test("connect: co-flatMap") {
    val env = StreamEnv(spark)
    val out = env.fromElements(2).connect(env.fromElements("ab"))
      .flatMap(i => Seq.fill(i)("i"), s => s.map(_.toString))
      .toDataset.collect().sorted.toSeq
    assert(out == Seq("a", "b", "i", "i"))
  }

  test("event-time timer fires when the watermark passes it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Int)]
    // buffer per-key sums; flush via event-time timer 5s after the
    // element's timestamp
    val proc = new KeyedProcess[String, (Timestamp, String, Int), Int, (String, Int)] {
      def processElement(key: String, v: (Timestamp, String, Int), ctx: Ctx[Int]) = {
        ctx.update(ctx.value.getOrElse(0) + v._3)
        ctx.registerEventTimer(v._1.getTime + 5000)
        Nil
      }
      override def onTimer(key: String, ctx: Ctx[Int]) =
        Seq((key, ctx.value.getOrElse(0)))
    }
    val out = StreamEnv(spark).fromDataset(in.toDS())
      .withWatermark("_1", "0 seconds")
      .keyBy(_._2)
      .process(proc, GroupStateTimeout.EventTimeTimeout)
      .toDataset
    val q = out.writeStream.format("memory").queryName("et_timer")
      .outputMode(OutputMode.Update).start()
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      in.addData((ts("2024-01-01 00:00:01"), "a", 7),
        (ts("2024-01-01 00:00:02"), "a", 3))
      q.processAllAvailable()
      assert(spark.table("et_timer").count() == 0) // watermark still behind
      // advance the watermark past 00:00:07 via a later element
      in.addData((ts("2024-01-01 00:01:00"), "other", 0))
      q.processAllAvailable()
      // timeout evaluation happens on the batch after the watermark moves
      in.addData((ts("2024-01-01 00:02:00"), "other2", 0))
      q.processAllAvailable()
      val rows = spark.table("et_timer").as[(String, Int)].collect().toSet
      assert(rows.contains(("a", 10)))
    } finally q.stop()
  }
}
