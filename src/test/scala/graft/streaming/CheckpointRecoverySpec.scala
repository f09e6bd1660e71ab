package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Fault-tolerance capability class (SURVEY §2.6 checkpoint row: the
  * reference ships only barrier/snapshot TYPES with no coordinator; Spark
  * restores exactly-once recovery via checkpointLocation). A stateful
  * running reduce is stopped and restarted from its checkpoint: keyed
  * state and source offsets must survive, and nothing is double-counted.
  */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("keyed state and offsets survive a stop/restart from checkpoint") {
    val srcDir = Files.createTempDirectory("graft_ckpt_src").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val outDir = Files.createTempDirectory("graft_ckpt_out").toString
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("v", IntegerType)))

    // memory sink can't recover from a checkpoint; foreachBatch -> parquet
    // is the recoverable update-mode sink shape
    def startQuery() = StreamEnv(spark)
      .fromDataset(spark.readStream.schema(schema).parquet(srcDir)
        .as[(String, Int)])
      .keyBy(_._1)
      .reduce((a, b) => (a._1, a._2 + b._2))
      .toDataset
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Int)],
          _: Long) =>
        batch.write.mode(SaveMode.Append).parquet(outDir)
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update).start()

    Seq(("a", 1), ("b", 2)).toDF("k", "v")
      .write.mode(SaveMode.Append).parquet(srcDir)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // new data arrives while the query is down
    Seq(("a", 10)).toDF("k", "v").write.mode(SaveMode.Append).parquet(srcDir)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val latest = spark.read.parquet(outDir).as[(String, Int)].collect()
        .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).max) }
      // a = 1 (pre-stop) + 10 (post-restart) — state carried over, the
      // pre-stop file was not re-read (offsets carried over too)
      assert(latest == Map("a" -> 11, "b" -> 2))
    } finally q2.stop()
  }
}
