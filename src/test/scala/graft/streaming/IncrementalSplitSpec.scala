package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.SparkSpec

/** Split-on-ingest pins: exact-fp and band adoption, the within-batch CC
  * grouping, the own-hash fallback's q224-rule equality (computed
  * independently in the test, not via the operator's own Column), and
  * ascending-order batching invariance on real corpus docs. */
class IncrementalSplitSpec extends SparkSpec {
  import spark.implicits._

  private val provider = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Drive the probe -> assign -> admit protocol over the given
    * batches; returns every doc's final assignment. */
  private def runPipeline(batches: Seq[Seq[(Long, String)]],
      name: String): Map[Long, String] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Boolean, String)]
    val ev = IncrementalSplit.evidence(
      in.toDS().toDF("doc_id", "text", "admit", "split"))
    val cands = StreamEnv(spark).fromDataset(ev)
      .keyBy(_.key)
      .transformWithState(new IncrementalSplitProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDataset
    val q = cands.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
    val out = mutable.Map[Long, String]()
    try {
      batches.foreach { b =>
        in.addData(b.map(d => (d._1, d._2, false, "")))
        q.processAllAvailable()
        val ids = b.map(_._1)
        val cand = spark.table(name)
          .filter(col("docId").isin(ids: _*))
        val asg = IncrementalSplit
          .assignSplits(cand, b.toDF("doc_id", "text"))
          .as[(Long, String)].collect()
        asg.foreach { case (id, sp) => out(id) = sp }
        val byId = asg.toMap
        in.addData(b.map(d => (d._1, d._2, true, byId(d._1))))
        q.processAllAvailable()
      }
    } finally q.stop()
    out.toMap
  }

  private def withRocks[T](body: => T): T = {
    val prev = spark.conf.get(provider)
    spark.conf.set(provider, rocks)
    try body finally spark.conf.set(provider, prev)
  }

  /** q224's nibble rule, computed INDEPENDENTLY of the operator. */
  private def refSplit(docId: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(docId.toString.getBytes("UTF-8"))
    val nib = (d(0) >> 4) & 0xf
    if (nib <= 11) "train" else if (nib <= 13) "val" else "test"
  }

  private val baseText = ("the quick brown fox jumps over the lazy dog " +
    "while seventeen engineers debate the merits of distributed " +
    "checkpointing under moderate load in a busy warehouse").trim

  test("adoption paths, within-batch grouping, own-hash fallback") {
    withRocks {
      val a = (2L, baseText)
      val bExact = (7L, baseText) // identical text -> exact-fp adoption
      val cNear = (11L, baseText.replace("warehouse", "datacenter"))
      val dAlone = (13L, "completely unrelated words about marmalade " +
        "sandwiches and the postal service of a small island nation")
      // e/f: identical docs in the SAME probe batch -> within-batch CC
      val e = (17L, "an entirely different corpus sentence repeated " +
        "verbatim across two same-batch arrivals for the internal check")
      val f = (19L, e._2)
      val got = runPipeline(Seq(Seq(a), Seq(bExact), Seq(cNear, dAlone),
        Seq(e, f)), "inc_split_hand")
      assert(got(2L) == refSplit(2L))         // first arrival: own hash
      assert(got(7L) == got(2L))              // exact-fp adoption
      assert(got(11L) == got(2L))             // band near-dup adoption
      assert(got(13L) == refSplit(13L))       // isolated: own hash
      assert(got(17L) == got(19L))            // same-batch twins agree
      // the same-batch group falls back to its min-label root's hash
      assert(got(17L) == refSplit(17L))
    }
  }

  test("ascending-order batching invariance on sf0.01 docs") {
    withRocks {
      val docs = graft.sources.Tables(spark, "/root/testdata/sf0.01",
          "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().sortBy(_._1).take(40).toSeq
      val fine = runPipeline(docs.map(Seq(_)), "inc_split_fine")
      val coarse = runPipeline(docs.grouped(10).toSeq, "inc_split_coarse")
      assert(fine.size == 40 && coarse.size == 40)
      assert(fine == coarse)
    }
  }

  test("exact duplicates can never straddle the fence, any batching") {
    withRocks {
      // 6 copies of one doc scattered across batches and mixed with
      // noise docs: every copy must land in ONE split
      val copies = Seq(101L, 205L, 309L, 404L, 511L, 620L)
        .map(id => (id, baseText + " padded variant"))
      val noise = Seq(
        (150L, "noise one about gardening tools and copper kettles " +
          "in the back shed"),
        (260L, "noise two regarding alpine weather patterns and " +
          "seasonal migration of birds"))
      val batches = Seq(
        Seq(copies(0), noise(0)), Seq(copies(1), copies(2)),
        Seq(noise(1)), Seq(copies(3)), Seq(copies(4), copies(5)))
      val got = runPipeline(batches, "inc_split_dups")
      val splits = copies.map(c => got(c._1)).distinct
      assert(splits.size == 1)
    }
  }

  test("stop/restart resumes the split index from the engine checkpoint") {
    withRocks {
      import IncrementalSplit.Cand
      val srcDir = java.nio.file.Files
        .createTempDirectory("graft_split_src").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_split_ckpt").toString
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_split_out").toString
      def startQuery() = {
        val ev = IncrementalSplit.evidence(spark.readStream
          .schema("doc_id LONG, text STRING, admit BOOLEAN, split STRING")
          .parquet(srcDir))
        StreamEnv(spark).fromDataset(ev)
          .keyBy(_.key)
          .transformWithState(new IncrementalSplitProcessor,
            TimeMode.None(), OutputMode.Update())
          .toDataset
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[Cand], _: Long) =>
            b.write.mode(org.apache.spark.sql.SaveMode.Append)
              .parquet(outDir)
          }
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Update)
          .start()
      }
      // run 1 admits A at an explicit split; run 2 (fresh query, same
      // checkpoint) probes an exact copy and a near-dup: lost state
      // would emit no candidates at all
      Seq((2L, baseText, true, "val")).toDF("doc_id", "text", "admit", "split")
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(srcDir)
      val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
      Seq((7L, baseText, false, ""),
          (11L, baseText.replace("warehouse", "datacenter"), false, ""))
        .toDF("doc_id", "text", "admit", "split")
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(srcDir)
      val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
      val cands = spark.read.parquet(outDir).as[Cand].collect().toSeq
      assert(cands.exists(c => c.docId == 7L && c.split == "val"),
        "exact-fp state lost across restart")
      assert(cands.exists(c => c.docId == 11L && c.split == "val"),
        "band state lost across restart")
    }
  }
}
