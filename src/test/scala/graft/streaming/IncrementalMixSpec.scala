package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The streaming quota gate against q195's prefix rule: identical
  * admitted sets under time-sliced and within-horizon disordered
  * feeds, exactly one emission per admitted doc, the permanent close
  * after the first overflow, and zero-quota sources admitting
  * nothing. */
class IncrementalMixSpec extends SparkSpec {
  import spark.implicits._
  import IncrementalMix.{Doc, Taken}

  private def doc(src: String, id: Long, tok: Long): Doc =
    Doc(src, id, tok, java.time.Instant.ofEpochMilli(id + 1000L))

  private def docs(): Seq[Doc] = {
    val rnd = new scala.util.Random(21)
    (0L until 500L).flatMap { id =>
      if (rnd.nextInt(5) == 0) None
      else Some(doc(s"s${rnd.nextInt(3)}", id, 1L + rnd.nextInt(80).toLong))
    }
  }

  /** Tight quotas so every source actually closes mid-stream. */
  private def quotas(ds: Seq[Doc]): Map[String, Long] =
    ds.groupBy(_.source).map { case (s, g) => s -> g.map(_.nTok).sum / 3L }

  /** The q195 rule, sequentially: running sum over ALL docs in doc_id
    * order, admit while cum <= alloc. */
  private def want(ds: Seq[Doc],
      quota: Map[String, Long]): Map[Long, (String, Long, Long)] =
    ds.groupBy(_.source).toSeq.flatMap { case (src, g) =>
      var cum = 0L
      g.sortBy(_.docId).flatMap { d =>
        cum += d.nTok
        if (cum <= quota.getOrElse(src, 0L))
          Some(d.docId -> ((src, d.nTok, cum)))
        else None
      }
    }.toMap

  private def withRocks[T](body: => T): T = {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(provider)
    spark.conf.set(provider, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body finally spark.conf.set(provider, prev)
  }

  private def sentinel(all: Seq[Doc]): Doc =
    doc("zz", all.map(_.docId).max + 100000L, 1L)

  private def run(feeds: Seq[Seq[Doc]], quota: Map[String, Long],
      lateness: String, name: String): Seq[Taken] = withRocks {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = IncrementalMix.taken(in.toDS(), quota, lateness)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      feeds.foreach { f => in.addData(f); q.processAllAvailable() }
      in.addData(Seq.empty[Doc]); q.processAllAvailable()
      spark.table(name).as[Taken].collect().toSeq
    } finally q.stop()
  }

  private def asMap(got: Seq[Taken]) =
    got.filter(_.source != "zz")
      .map(t => t.docId -> ((t.source, t.nTok, t.cumw))).toMap

  test("time-sliced feed equals the q195 prefix rule; sources close") {
    val all = docs().sortBy(_.docId)
    val quota = quotas(all)
    val expected = want(all, quota)
    // tight quotas really do close every source before its stream ends
    all.groupBy(_.source).foreach { case (s, g) =>
      assert(g.map(_.nTok).sum > quota(s), s"quota for $s never binds")
    }
    val cuts = Seq(all.size / 3, 2 * all.size / 3, all.size)
    val feeds = (0 +: cuts).zip(cuts).map { case (a, b) =>
      all.slice(a, b) } :+ Seq(sentinel(all))
    val got = run(feeds, quota, "0 milliseconds", "mix_sliced")
    assert(got.size == got.map(_.docId).distinct.size)
    assert(asMap(got) == expected)
    // nothing past a source's last admitted doc ever appears
    val lastIn = expected.groupBy(_._2._1).view
      .mapValues(_.keys.max).toMap
    got.filter(_.source != "zz").foreach { t =>
      assert(t.docId <= lastIn(t.source)) }
  }

  test("within-horizon disorder converges to the same admitted set") {
    val all = docs()
    val quota = quotas(all)
    val rnd = new scala.util.Random(34)
    val disordered = all.grouped(40).flatMap(g => rnd.shuffle(g)).toSeq
    val feeds = disordered.grouped(83).toSeq :+ Seq(sentinel(all))
    val got = run(feeds, quota, "100 milliseconds", "mix_disorder")
    assert(got.size == got.map(_.docId).distinct.size)
    assert(asMap(got) == want(all, quota))
  }

  test("a source with no quota admits nothing; others unaffected") {
    val keep = Seq(doc("a", 1L, 10L), doc("b", 2L, 10L), doc("a", 3L, 10L))
    val quota = Map("a" -> 100L) // b absent -> quota 0
    val got = run(Seq(keep, Seq(sentinel(keep))), quota,
      "0 milliseconds", "mix_zero")
    assert(asMap(got) == Map(
      1L -> (("a", 10L, 10L)), 3L -> (("a", 10L, 20L))))
  }
}
