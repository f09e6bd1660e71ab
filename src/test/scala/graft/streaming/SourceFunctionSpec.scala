package graft.streaming

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The reference's SourceFunction run/cancel contract
  * (source/SourceFunction.java:29-36 + StreamExecutionEnvironment.
  * java:189-199) driven through StreamEnv.addSource: a driver-thread
  * run loop feeding an unbounded stream, stopped by cancel(). */
class SourceFunctionSpec extends SparkSpec {
  import spark.implicits._

  /** Shaped like the reference's canonical source: a while(running)
    * emit loop with a volatile cancel flag. */
  class CountSource(limit: Int) extends SourceFunction[Int] {
    val running = new AtomicBoolean(true)
    @volatile var emitted = 0
    def run(ctx: SourceContext[Int]): Unit = {
      var i = 1
      while (running.get() && i <= limit) {
        ctx.collect(i)
        emitted = i
        i += 1
      }
    }
    def cancel(): Unit = running.set(false)
  }

  test("addSource runs the run-loop and every emission reaches the sink") {
    val env = StreamEnv(spark)
    val src = new CountSource(100)
    val q = env.addSource(src).toDataset
      .writeStream.format("memory").queryName("sfn_all")
      .outputMode(OutputMode.Append).start()
    try {
      val rows = awaitTable("sfn_all")(_.length == 100)
      assert(rows.map(_.getInt(0)).sorted.toSeq == (1 to 100))
    } finally q.stop()
  }

  test("cancel() stops an unbounded run loop") {
    val env = StreamEnv(spark)
    // unbounded: emits until cancelled (limit effectively infinite)
    val src = new CountSource(Int.MaxValue) {
      override def run(ctx: SourceContext[Int]): Unit = {
        var i = 1
        while (running.get()) {
          ctx.collect(i)
          emitted = i
          i += 1
          Thread.sleep(1) // pace the loop so cancel lands mid-stream
        }
      }
    }
    val q = env.addSource(src).toDataset
      .writeStream.format("memory").queryName("sfn_cancel")
      .outputMode(OutputMode.Append).start()
    try {
      awaitTable("sfn_cancel")(_.length >= 5)
      src.cancel()
      // after cancel the loop must terminate: emitted stops advancing
      val stoppedAt = { Thread.sleep(300); src.emitted }
      Thread.sleep(300)
      assert(src.emitted == stoppedAt, "run loop kept emitting after cancel()")
      // and everything emitted before cancel still drains to the sink
      val rows = awaitTable("sfn_cancel")(_.length >= stoppedAt)
      assert(rows.map(_.getInt(0)).distinct.length == rows.length)
    } finally q.stop()
  }
}
