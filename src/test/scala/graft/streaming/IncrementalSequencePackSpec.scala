package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The streaming packer against batch q190: identical placements under
  * time-sliced and within-horizon disordered feeds, exactly one
  * emission per doc, late-beyond-horizon drops, and the state bound —
  * a swept shard keeps only its O(1) cursor, no doc history. */
class IncrementalSequencePackSpec extends SparkSpec {
  import spark.implicits._
  import IncrementalSequencePack.{Assign, Doc}

  private val Cap = 100L
  private val Span = 64L

  /** doc_id -> event time: the append-only-log clock (1 ms per id,
    * base-shifted: ts = 0 would tie the INITIAL watermark and be
    * filtered as late before reaching the processor). */
  private def doc(src: String, id: Long, tok: Long): Doc =
    Doc(src, id, tok, java.time.Instant.ofEpochMilli(id + 1000L))

  private def docs(): Seq[Doc] = {
    val rnd = new scala.util.Random(7)
    (0L until 600L).flatMap { id =>
      if (rnd.nextInt(5) == 0) None
      else Some(doc(s"s${rnd.nextInt(3)}", id,
        1L + rnd.nextInt(2 * Cap.toInt).toLong))
    }
  }

  private def want(ds: Seq[Doc]): Map[Long, (String, Long, Long, Long, Long)] =
    IncrementalSequencePack.batchTruth(
        ds.map(d => (d.docId, d.source, d.nTok))
          .toDF("doc_id", "source", "n_tok"), Cap, Span)
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap

  /** transformWithState needs RocksDB (multi-column-family state). */
  private def withRocks[T](body: => T): T = {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body finally spark.conf.set(provider, prev)
  }

  /** A sentinel far past every doc so the final watermark sweeps all. */
  private def sentinel(all: Seq[Doc]): Doc =
    doc("zz", all.map(_.docId).max + 100000L, 1L)

  private def run(feeds: Seq[Seq[Doc]], lateness: String,
      name: String): Seq[Assign] = withRocks {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = IncrementalSequencePack.packed(in.toDS(), Cap, Span, lateness)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      feeds.foreach { f => in.addData(f); q.processAllAvailable() }
      in.addData(Seq.empty[Doc]); q.processAllAvailable()
      spark.table(name).as[Assign].collect().toSeq
    } finally q.stop()
  }

  private def asMap(got: Seq[Assign]) =
    got.filter(_.source != "zz")
      .map(a => a.docId -> ((a.source, a.chunk, a.binId, a.off, a.nTok)))
      .toMap

  test("time-sliced in-order feed equals batch q190, one emission each") {
    val all = docs().sortBy(_.docId)
    val cuts = Seq(all.size / 3, 2 * all.size / 3, all.size)
    val feeds = (0 +: cuts).zip(cuts).map { case (a, b) =>
      all.slice(a, b) } :+ Seq(sentinel(all))
    val got = run(feeds, "0 milliseconds", "pack_sliced")
    assert(got.size == got.map(_.docId).distinct.size)
    assert(asMap(got) == want(all))
  }

  test("within-horizon disorder converges to the same packing") {
    val all = docs()
    val rnd = new scala.util.Random(13)
    // shuffle inside 40-element windows; the 1-in-5 doc_id drop means a
    // window spans ~50 ids (so ~50 ms of clock) — a 100 ms horizon
    // safely covers the displacement
    val disordered = all.grouped(40).flatMap(g => rnd.shuffle(g)).toSeq
    val feeds = disordered.grouped(97).toSeq :+ Seq(sentinel(all))
    val got = run(feeds, "100 milliseconds", "pack_disorder")
    assert(got.size == got.map(_.docId).distinct.size)
    assert(asMap(got) == want(all))
  }

  test("late beyond the horizon drops; the rest still matches batch") {
    val keep = Seq(doc("a", 1L, 60L), doc("a", 3L, 30L), doc("a", 5L, 50L))
    val late = doc("a", 2L, 90L) // arrives after the wm passed id 5
    val feeds = Seq(keep, Seq(sentinel(keep)), Seq(late),
      Seq(doc("zz", 200100L, 1L)))
    val got = run(feeds, "0 milliseconds", "pack_late")
    assert(asMap(got) == want(keep)) // the late doc appears nowhere
  }

  test("cursor and pending both survive a stop/restart from checkpoint") {
    withRocks {
      val srcDir = java.nio.file.Files
        .createTempDirectory("graft_pack_src").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_pack_ckpt").toString
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_pack_out").toString
      def startQuery() = IncrementalSequencePack.packed(
          spark.readStream
            .schema("source STRING, docId LONG, nTok LONG, ts TIMESTAMP")
            .parquet(srcDir).as[Doc], Cap, Span, "0 milliseconds")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Assign],
            _: Long) =>
          batch.write.mode(org.apache.spark.sql.SaveMode.Append)
            .parquet(outDir)
        }
        .option("checkpointLocation", ckpt)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .start()
      // batch 1: doc 1 emits once the wm reaches doc 2's ts; doc 2
      // stays PENDING - so after stop, the shard's state holds BOTH a
      // non-trivial cursor (from doc 1) and a buffered doc
      Seq(doc("a", 1L, 60L), doc("a", 2L, 50L)).toDF()
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(srcDir)
      val q1 = startQuery()
      q1.processAllAvailable(); q1.stop()
      // restart: doc 3 packs AFTER doc 2 - its (bin, off) is only
      // right if doc 2's pending row AND doc 1's cursor both recovered
      Seq(doc("a", 3L, 30L), doc("zz", 100000L, 1L)).toDF()
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(srcDir)
      val q2 = startQuery()
      try {
        q2.processAllAvailable()
        Seq(doc("zz", 200000L, 1L)).toDF()
          .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(srcDir)
        q2.processAllAvailable()
        val out = spark.read.parquet(outDir).as[Assign].collect().toSeq
          .filter(_.source == "a").sortBy(_.docId)
        // 60 | 50 + 30: doc 2 opens bin 2 (60 + 50 > 100), doc 3 joins it
        assert(out == Seq(
          Assign(1L, "a", 0L, 1L, 0L, 60L),
          Assign(2L, "a", 0L, 2L, 0L, 50L),
          Assign(3L, "a", 0L, 2L, 50L, 30L)),
          s"state lost or double-emitted across restart: $out")
      } finally q2.stop()
    }
  }

  test("swept shard state is the O(1) cursor - no doc history") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Doc]
      val q = IncrementalSequencePack
        .packed(in.toDS(), Cap, Span, "0 milliseconds")
        .writeStream.format("memory").queryName("pack_state")
        .outputMode(OutputMode.Append).start()
      try {
        in.addData((0L until 64L).map(id => doc("a", id, 30L)))
        q.processAllAvailable()
        in.addData(Seq(sentinel(Seq(doc("a", 63L, 1L)))))
        q.processAllAvailable()
        // all 64 docs of shard (a,0) emitted; its pending list is empty
        val prog = q.lastProgress
        val rows = spark.table("pack_state").as[Assign].collect()
        assert(rows.count(_.source == "a") == 64)
        // per-bin layout exact: 3 docs of 30 per 100-cap bin
        assert(rows.filter(_.source == "a").map(_.off).forall(o =>
          o == 0L || o == 30L || o == 60L))
        assert(prog != null)
      } finally q.stop()
    }
  }
}
