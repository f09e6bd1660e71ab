package graft.queries

import graft.SparkSpec

/** q190's packing core against an independent in-memory greedy: the
  * next-fit recurrence (reset fill on overflow, bins dense from 1)
  * replayed per (source, chunk) shard in plain Scala, compared
  * bit-for-bit on adversarial mixes — oversized docs, exact-fit
  * boundaries, chunk-boundary resets, and a randomized sweep across
  * caps and shard spans. Invariants pinned besides equality: every
  * (off + n_tok) <= cap, bin ids dense and monotone in doc order,
  * offsets contiguous within a bin. */
class SequencePackSpec extends SparkSpec {
  import spark.implicits._

  private type Row6 = (Long, String, Long, Long, Long, Long)

  /** The definition: sequential greedy per shard. */
  private def reference(docs: Seq[(Long, String, Long)], cap: Long,
      span: Long): Seq[Row6] =
    docs.map { case (id, s, t) => (id, s, math.min(t, cap)) }
      .groupBy { case (id, s, _) => (s, id / span) }
      .toSeq
      .flatMap { case ((s, chunk), g) =>
        var fill = 0L
        var bin = 0L
        g.sortBy(_._1).map { case (id, _, t) =>
          if (bin == 0L || fill + t > cap) { bin += 1L; fill = t }
          else fill += t
          (id, s, chunk, bin, fill - t, t)
        }
      }
      .sortBy(_._1)

  private def run(docs: Seq[(Long, String, Long)], cap: Long,
      span: Long): Seq[Row6] =
    Profiling.packSeqs(docs.toDF("doc_id", "source", "n_tok"), cap, span)
      .orderBy("doc_id")
      .as[Row6].collect().toSeq

  private def checkInvariants(rows: Seq[Row6], cap: Long): Unit = {
    assert(rows.forall { case (_, _, _, _, off, t) => off + t <= cap })
    rows.groupBy { case (_, s, c, _, _, _) => (s, c) }.foreach {
      case (_, g) =>
        val ordered = g.sortBy(_._1)
        // bins dense from 1 and monotone in doc order
        val bins = ordered.map(_._4)
        assert(bins.head == 1L)
        assert(bins.zip(bins.tail).forall { case (a, b) =>
          b == a || b == a + 1L })
        // offsets contiguous within each bin
        ordered.groupBy(_._4).foreach { case (_, bg) =>
          val sorted = bg.sortBy(_._1)
          assert(sorted.head._5 == 0L)
          assert(sorted.zip(sorted.tail).forall { case (a, b) =>
            b._5 == a._5 + a._6 })
        }
    }
  }

  test("oversized docs truncate and occupy a bin alone") {
    val docs = Seq((0L, "a", 300L), (1L, "a", 10L), (2L, "a", 90L),
      (3L, "a", 101L), (10L, "b", 1L))
    val got = run(docs, 100L, 64L)
    assert(got == reference(docs, 100L, 64L))
    checkInvariants(got, 100L)
    // the 300-token doc is capped at 100 and fills bin 1 of shard (a,0)
    assert(got.head == ((0L, "a", 0L, 1L, 0L, 100L)))
    // 10 + 90 fill bin 2 exactly; the 101->100 doc starts bin 3
    assert(got(1) == ((1L, "a", 0L, 2L, 0L, 10L)))
    assert(got(2) == ((2L, "a", 0L, 2L, 10L, 90L)))
    assert(got(3) == ((3L, "a", 0L, 3L, 0L, 100L)))
  }

  test("exact-fit boundary stays in the bin; one over resets") {
    val fit = Seq((0L, "a", 60L), (1L, "a", 40L), (2L, "a", 1L))
    val gotFit = run(fit, 100L, 64L)
    assert(gotFit == reference(fit, 100L, 64L))
    assert(gotFit.map(_._4) == Seq(1L, 1L, 2L))
    val over = Seq((0L, "a", 60L), (1L, "a", 41L))
    assert(run(over, 100L, 64L).map(_._4) == Seq(1L, 2L))
  }

  test("chunk boundaries reset packing state") {
    val docs = Seq((63L, "a", 10L), (64L, "a", 10L))
    val got = run(docs, 100L, 64L)
    assert(got.map(r => (r._3, r._4, r._5)) ==
      Seq((0L, 1L, 0L), (1L, 1L, 0L)))
  }

  /** Independent BFD reference: fullest-that-fits, ties to the lowest
    * bin index, walk order (n_tok DESC, doc_id). */
  private def referenceBfd(docs: Seq[(Long, String, Long)], cap: Long,
      span: Long): Seq[Row6] =
    docs.map { case (id, s, t) => (id, s, math.min(t, cap)) }
      .groupBy { case (id, s, _) => (s, id / span) }
      .toSeq
      .flatMap { case ((s, chunk), g) =>
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        g.sortBy { case (id, _, t) => (-t, id) }.map { case (id, _, t) =>
          val eligible = fills.zipWithIndex.filter(_._1 + t <= cap)
          if (eligible.isEmpty) {
            fills += t
            (id, s, chunk, fills.length.toLong, 0L, t)
          } else {
            val (o, i) = eligible.maxBy(e => (e._1, -e._2))
            fills(i) = o + t
            (id, s, chunk, i + 1L, o, t)
          }
        }
      }
      .sortBy(_._1)

  private def runBfd(docs: Seq[(Long, String, Long)], cap: Long,
      span: Long): Seq[Row6] =
    Profiling.packBestFit(docs.toDF("doc_id", "source", "n_tok"), cap, span)
      .orderBy("doc_id")
      .as[Row6].collect().toSeq

  test("best-fit-decreasing matches the in-memory reference") {
    // hand-built shard where best-fit and next-fit genuinely diverge:
    // decreasing walk 90, 60, 50, 40, 10 at cap 100 -> BFD bins
    // {90,10},{60,40},{50} (3 bins); placement of the 10 must pick the
    // FULLEST bin (90), not the first open one
    val docs = Seq((0L, "a", 90L), (1L, "a", 60L), (2L, "a", 50L),
      (3L, "a", 40L), (4L, "a", 10L))
    val got = runBfd(docs, 100L, 64L)
    assert(got == referenceBfd(docs, 100L, 64L))
    assert(got.map(_._4).toSet == Set(1L, 2L, 3L))
    assert(got(4) == ((4L, "a", 0L, 1L, 90L, 10L))) // joined the 90-bin
    // equal-fill tie goes to the LOWEST bin index: 60|60 can't share a
    // bin, so the 30 sees two equally-full eligible bins and picks bin 1
    val tie = Seq((0L, "a", 60L), (1L, "a", 60L), (2L, "a", 30L))
    val gotTie = runBfd(tie, 100L, 64L)
    assert(gotTie == referenceBfd(tie, 100L, 64L))
    assert(gotTie(2) == ((2L, "a", 0L, 1L, 60L, 30L)))
  }

  test("BFD randomized sweep; never more bins than next-fit") {
    val rnd = new scala.util.Random(99)
    for (cap <- Seq(64L, 100L, 256L); span <- Seq(16L, 64L)) {
      val docs = (0L until 400L).flatMap { id =>
        if (rnd.nextInt(4) == 0) None
        else Some((id * 3L, s"s${rnd.nextInt(3)}",
          1L + rnd.nextInt(2 * cap.toInt).toLong))
      }
      val got = runBfd(docs, cap, span)
      assert(got == referenceBfd(docs, cap, span),
        s"mismatch at cap=$cap span=$span")
      assert(got.forall { case (_, _, _, _, off, t) => off + t <= cap })
      // the quality claim, per shard: BFD's bin count <= next-fit's
      val nf = reference(docs, cap, span)
      def bins(rows: Seq[Row6]) = rows
        .groupBy(r => (r._2, r._3)).view
        .mapValues(_.map(_._4).max).toMap
      val (b, n) = (bins(got), bins(nf))
      assert(b.forall { case (k, v) => v <= n(k) },
        s"BFD opened more bins than next-fit at cap=$cap span=$span")
    }
  }

  test("randomized sweep across caps and spans") {
    val rnd = new scala.util.Random(42)
    for (cap <- Seq(64L, 100L, 256L); span <- Seq(16L, 64L)) {
      val docs = (0L until 400L).flatMap { id =>
        // sparse ids so shards see gaps, 3 sources interleaved
        if (rnd.nextInt(4) == 0) None
        else Some((id * 3L, s"s${rnd.nextInt(3)}",
          1L + rnd.nextInt(2 * cap.toInt).toLong))
      }
      val got = run(docs, cap, span)
      assert(got == reference(docs, cap, span),
        s"mismatch at cap=$cap span=$span")
      checkInvariants(got, cap)
    }
  }
}
