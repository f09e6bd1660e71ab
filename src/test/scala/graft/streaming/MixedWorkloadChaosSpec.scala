package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, TimeMode}
import org.apache.spark.sql.types._

import graft.{SparkEntry, SparkSpec}

/** Chaos/soak across twins sharing one session (round-12 verdict ask
  * #6): every twin pins restart-survival individually, but the failure
  * mode those specs cannot see is CROSS-QUERY state-store interference —
  * three stateful queries running concurrently in one SparkSession on
  * the RocksDB provider, each with its own checkpoint, killed mid-batch
  * and restarted. This suite runs the mixed workload:
  *
  *   IncrementalOov        (word-keyed vocab bit + count map, q237)
  *   IncrementalCdcStore   ((source,chunk)-keyed counts,       q244)
  *   IncrementalQuantiles  (flag-keyed price histogram,        q143)
  *
  * over FILE sources (the recoverable source CheckpointRecoverySpec
  * established; MemoryStream cannot restore offsets across a restart)
  * with foreachBatch parquet sinks. Two kill schedules: a single
  * mid-feed kill + recovery, and a DOUBLE kill where the second lands
  * during the recovery drain itself (the window where replayed state
  * versions and half-drained sources coexist). Whatever point each
  * kill lands at (batch unstarted, mid-flight, committed), every
  * twin's compacted report must equal its batch query BITWISE. The
  * sinks are at-least-once (foreachBatch append), which is exactly why
  * every twin's emissions are monotone per key and compaction is
  * max-per-key: replayed batches re-append rows the compaction absorbs.
  */
class MixedWorkloadChaosSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** One twin's harness: chunked source feed + recoverable query. */
  private case class Twin(
      name: String,
      chunks: Seq[DataFrame],
      start: (String, String, String) => StreamingQuery, // src, ckpt, out
      check: String => Unit) { // out dir -> assert parity
    val srcDir = tmp(s"graft_chaos_${name}_src")
    val ckpt = tmp(s"graft_chaos_${name}_ckpt")
    val outDir = tmp(s"graft_chaos_${name}_out")
    def feed(i: Int): Unit =
      chunks(i).coalesce(1).write.mode(SaveMode.Append).parquet(srcDir)
    def launch(): StreamingQuery = start(srcDir, ckpt, outDir)
  }

  // 20/60/20 splits: the fat middle chunk is in flight when the kill
  // lands, so recovery exercises an uncommitted batch
  private def split3(df: DataFrame, key: String): Seq[DataFrame] = {
    val h = org.apache.spark.sql.functions
      .abs(org.apache.spark.sql.functions.hash(
        org.apache.spark.sql.functions.col(key))) % 5
    Seq(df.filter(h === 0), df.filter(h >= 1 && h <= 3), df.filter(h === 4))
  }

  /** Fresh twin triple (fresh src/ckpt/out dirs per test). */
  private def mkTwins(): Seq[Twin] = {
    val docs = graft.sources.Tables(spark, dir, "documents")
    val line = graft.sources.Tables(spark, dir, "lineitem")

    val oovSchema = StructType(Seq(StructField("tok", StringType),
      StructField("source", StringType),
      StructField("isTrain", LongType)))
    val oov = Twin("oov",
      split3(IncrementalOov.observations(docs).toDF(), "tok"),
      (src, ckpt, out) => StreamEnv(spark)
        .fromDataset(spark.readStream.schema(oovSchema)
          .option("maxFilesPerTrigger", "1").parquet(src)
          .as[IncrementalOov.Tok])
        .keyBy(_.tok)
        .transformWithState(new IncrementalOovProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDataset
        .writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[IncrementalOov.WordCount],
              _: Long) =>
            b.write.mode(SaveMode.Append).parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update).start(),
      out => {
        val got = IncrementalOov.report(spark.read.parquet(out))
          .as[(String, Long, Long, Long, Long)].collect().toSet
        val want = SparkEntry.queries("q237_oov_rate")(spark, dir)
          .as[(String, Long, Long, Long, Long)].collect().toSet
        assert(got == want,
          "OOV report diverged from batch q237 after chaos recovery")
      })

    val cdcSchema = StructType(Seq(StructField("source", StringType),
      StructField("h", StringType),
      StructField("clen", LongType)))
    val cdc = Twin("cdc",
      split3(IncrementalCdcStore.observations(docs).toDF(), "h"),
      (src, ckpt, out) => StreamEnv(spark)
        .fromDataset(spark.readStream.schema(cdcSchema)
          .option("maxFilesPerTrigger", "1").parquet(src)
          .as[IncrementalCdcStore.Chunk])
        .keyBy(c => c.source + "|" + c.h)
        .transformWithState(new IncrementalCdcStoreProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDataset
        .writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[IncrementalCdcStore.ChunkCount],
              _: Long) =>
            b.write.mode(SaveMode.Append).parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update).start(),
      out => {
        val got = IncrementalCdcStore.report(spark.read.parquet(out))
          .as[(String, Long, Long, Long, Long)].collect().toSet
        val want = SparkEntry.queries("q244_cdc_chunks")(spark, dir)
          .as[(String, Long, Long, Long, Long)].collect().toSet
        assert(got == want,
          "CDC report diverged from batch q244 after chaos recovery")
      })

    val quantSchema = StructType(Seq(StructField("flag", StringType),
      StructField("price", DoubleType),
      StructField("qty", LongType)))
    val quant = Twin("quant",
      split3(IncrementalQuantiles.observations(line).toDF(), "price"),
      (src, ckpt, out) => StreamEnv(spark)
        .fromDataset(spark.readStream.schema(quantSchema)
          .option("maxFilesPerTrigger", "1").parquet(src)
          .as[IncrementalQuantiles.Ev])
        .keyBy(_.flag)
        .transformWithState(new IncrementalQuantilesProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDataset
        .writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[IncrementalQuantiles.Med],
              _: Long) =>
            b.write.mode(SaveMode.Append).parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update).start(),
      out => {
        val got = spark.read.parquet(out)
          .as[(String, Long, Double)].collect().toSeq
          .groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }.toSet
        val want = SparkEntry.queries("q143_weighted_median")(spark, dir)
          .as[(String, Long, Double)].collect().toSet
        assert(got == want,
          "median report diverged from batch q143 after chaos recovery")
      })

    Seq(oov, cdc, quant)
  }

  private def withRocksDB(body: => Unit): Unit = {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally spark.conf.set(provider, prev)
  }

  test("three twins share a session, die mid-batch, recover to batch parity") {
    withRocksDB {
      val twins = mkTwins()

      // phase 1: first slice, all three running concurrently, checkpointed
      twins.foreach(_.feed(0))
      val run1 = twins.map(_.launch())
      run1.foreach(_.processAllAvailable())

      // phase 2: the fat slice lands and the kill does NOT wait for it —
      // each query dies wherever it is (the chaos). A short staggered
      // sleep makes "mid-batch" the common case without making the test
      // timing-dependent: parity must hold wherever the kill landed.
      twins.foreach(_.feed(1))
      Thread.sleep(300)
      run1.foreach(_.stop())

      // phase 3: restart ALL from their checkpoints, finish the corpus
      val run2 = twins.map(_.launch())
      try {
        twins.foreach(_.feed(2))
        run2.foreach(_.processAllAvailable())
      } finally run2.foreach(_.stop())

      twins.foreach(t => t.check(t.outDir))
    }
  }

  test("a second kill during the recovery drain still lands on batch parity") {
    withRocksDB {
      val twins = mkTwins()

      // same opening: slice 0 committed, slice 1 killed mid-flight
      twins.foreach(_.feed(0))
      val run1 = twins.map(_.launch())
      run1.foreach(_.processAllAvailable())
      twins.foreach(_.feed(1))
      Thread.sleep(200)
      run1.foreach(_.stop())

      // restart and kill AGAIN while the recovery drain is replaying
      // slice 1 — the window where a replayed state version, a
      // half-drained source, and an at-least-once sink all coexist
      val run2 = twins.map(_.launch())
      Thread.sleep(250)
      run2.foreach(_.stop())

      // second recovery finishes the corpus; parity must still hold
      val run3 = twins.map(_.launch())
      try {
        twins.foreach(_.feed(2))
        run3.foreach(_.processAllAvailable())
      } finally run3.foreach(_.stop())

      twins.foreach(t => t.check(t.outDir))
    }
  }
}
