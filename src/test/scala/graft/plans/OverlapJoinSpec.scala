package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TemporalJoins

/** The native plane-sweep overlap join against the tier-(a) binned
  * equi-join AND a brute-force cross-join reference: identical pair
  * sets on colliding synthetic intervals (shared endpoints, containment,
  * zero-length, inverted, null bounds), under any partitioning, with
  * the custom exec actually planned. */
class OverlapJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(23)
  // dense small universe so containment/shared-endpoint cases occur
  private val leftRows = List.tabulate(180)(i =>
    (i % 5, rnd.nextInt(500).toLong, rnd.nextInt(40).toLong, 1000 + i))
    .map { case (k, s, w, id) => (k, s, s + w, id) }
  private val rightRows = List.tabulate(200)(i =>
    (i % 5, rnd.nextInt(500).toLong, rnd.nextInt(40).toLong, 2000 + i))
    .map { case (k, s, w, id) => (k, s, s + w, id) }

  private def leftDf = leftRows.toDF("k", "s0", "e0", "lid")
  private def rightDf = rightRows.toDF("k", "rs0", "re0", "rid")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Int, Int)] =
    df.select(col("lid"), col("rid")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet

  private def bruteForce: Set[(Int, Int)] =
    (for {
      (lk, ls, le, lid) <- leftRows
      (rk, rs, re, rid) <- rightRows
      if lk == rk && ls <= re && rs <= le
    } yield (lid, rid)).toSet

  test("native exec equals brute force and the binned form; exec is planned") {
    val native = OverlapJoin.join(leftDf, rightDf, "k",
      "s0", "e0", "rs0", "re0", Seq("rid"))
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("OverlapJoin"), s"exec not planned:\n$plan")
    assert(pairs(native) == bruteForce)
    val binned = TemporalJoins.overlap(leftDf,
      rightDf.select(col("k"), col("rs0"), col("re0"), col("rid")),
      "k", "s0", "e0", "rs0", "re0", 64L, Seq("rid"))
    assert(pairs(binned) == bruteForce, "baseline itself diverged")
  }

  test("partition-count invariant (co-partitioned sweep)") {
    for ((lp, rp) <- Seq((1, 6), (11, 3), (32, 32))) {
      val got = pairs(OverlapJoin.join(
        leftDf.repartition(lp), rightDf.repartition(rp), "k",
        "s0", "e0", "rs0", "re0", Seq("rid")))
      assert(got == bruteForce, s"diverged at partitions ($lp, $rp)")
    }
  }

  test("degenerate intervals: zero-length, inverted, boundary touch, nulls") {
    val l = Seq(
      (1, 10L, 10L, 1),            // zero-length
      (1, 20L, 15L, 2),            // inverted: raw-inequality semantics
      (1, 30L, 40L, 3),
      (2, 5L, 9L, 4)).toDF("k", "s0", "e0", "lid")
    val r = Seq(
      (1, 10L, 10L, 10),           // equal zero-length: touches lid=1
      (1, 15L, 20L, 11),           // 20<=20 && 15<=15: matches lid=2
      (1, 40L, 50L, 12),           // boundary touch with lid=3 (closed)
      (2, 9L, 9L, 13)).toDF("k", "rs0", "re0", "rid")
    val got = pairs(OverlapJoin.join(l, r, "k",
      "s0", "e0", "rs0", "re0", Seq("rid")))
    assert(got == Set((1, 10), (2, 11), (3, 12), (4, 13)), got.toString)

    val lNull = Seq((Some(1), Some(10L), Some(20L), 1),
      (None, Some(10L), Some(20L), 2),
      (Some(1), None, Some(20L), 3)).toDF("k", "s0", "e0", "lid")
    val rNull = Seq((Some(1), Some(15L), Some(25L), 20),
      (Some(1), Some(15L), None, 21)).toDF("k", "rs0", "re0", "rid")
    val gotN = pairs(OverlapJoin.join(lNull, rNull, "k",
      "s0", "e0", "rs0", "re0", Seq("rid")))
    assert(gotN == Set((1, 20)), s"null bounds must be unmatchable: $gotN")
  }

  test("inverted intervals: raw-inequality semantics, all three forms agree") {
    // an inverted interval (e < s) still MATCHES under the raw SQL
    // inequality (l.s <= r.e && r.s <= l.e) — e.g. (20,15) vs (15,20).
    // The binned form inherits this (Spark's sequence() DESCENDS when
    // stop < start, covering the same bin range), and the sweep
    // reproduces it by pairing an inverted arrival against survivors
    // while never adding it to the active list (no future start can
    // precede its end). Pin the agreement on randomized data that is
    // ~half inverted rows, against the raw-inequality brute force.
    val r2 = new scala.util.Random(31)
    val lRows = List.tabulate(120)(i =>
      (i % 4, r2.nextInt(300).toLong,
        r2.nextInt(300).toLong, 3000 + i)) // ~half inverted
    val rRows = List.tabulate(120)(i =>
      (i % 4, r2.nextInt(300).toLong, r2.nextInt(300).toLong, 4000 + i))
    val want = (for {
      (lk, ls, le, lid) <- lRows
      (rk, rs, re, rid) <- rRows
      if lk == rk && ls <= re && rs <= le
    } yield (lid, rid)).toSet
    val l = lRows.toDF("k", "s0", "e0", "lid")
    val r = rRows.toDF("k", "rs0", "re0", "rid")
    val native = pairs(OverlapJoin.join(l, r, "k",
      "s0", "e0", "rs0", "re0", Seq("rid")))
    assert(native == want)
    val binned = pairs(TemporalJoins.overlap(l,
      r.select(col("k"), col("rs0"), col("re0"), col("rid")),
      "k", "s0", "e0", "rs0", "re0", 32L, Seq("rid")))
    assert(binned == want, "tier-(a) diverged from the shared contract")
  }

  test("string keys survive sorter spill (stored keys must be owned)") {
    // 120k rows/side through ONE task (shuffle.partitions=1) with the
    // session's 50k force-spill threshold: both children's sorts spill,
    // so every row the sweep sees lives in the spill reader's SHARED
    // buffer — a curKey stored without copy() would silently mutate to
    // the bytes of whatever row the cursor advanced to (the r8 fix at
    // OverlapJoinExec.keyChange). 8 string keys interleave in the merged
    // order, so key changes happen constantly against spilled rows.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val r3 = new scala.util.Random(59)
      val n = 120000
      val lRows = List.tabulate(n)(i => (f"key_${i % 8}%03d",
        r3.nextInt(2000000).toLong, r3.nextInt(20).toLong, i))
        .map { case (k, s, w, id) => (k, s, s + w, id) }
      val rRows = List.tabulate(n)(i => (f"key_${i % 8}%03d",
        r3.nextInt(2000000).toLong, r3.nextInt(20).toLong, n + i))
        .map { case (k, s, w, id) => (k, s, s + w, id) }
      // independent reference: per key, rights sorted by start; overlap
      // iff rs ∈ [ls - maxW, le] (w <= 20), verified exactly per hit
      val byKey = rRows.groupBy(_._1)
        .map { case (k, v) => k -> v.sortBy(_._2).toArray }
      val want = Set.newBuilder[(Int, Int)]
      lRows.foreach { case (k, ls, le, lid) =>
        val arr = byKey(k)
        var i = {
          var lo = 0; var hi = arr.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (arr(mid)._2 < ls - 20) lo = mid + 1 else hi = mid
          }
          lo
        }
        while (i < arr.length && arr(i)._2 <= le) {
          val (_, rs, re, rid) = arr(i)
          if (ls <= re && rs <= le) want += ((lid, rid))
          i += 1
        }
      }
      val got = pairs(OverlapJoin.join(
        lRows.toDF("k", "s0", "e0", "lid"),
        rRows.toDF("k", "rs0", "re0", "rid"),
        "k", "s0", "e0", "rs0", "re0", Seq("rid")))
      assert(got == want.result(),
        s"pair set corrupted under spill: got ${got.size}, want ${want.result().size}")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("skewed one-sided key: state stays at true concurrency, not row count") {
    // 40k left intervals on ONE hot key, width <= 9 with starts 10
    // apart (true concurrency <= 2 per side boundary), and only 3 right
    // rows: without SAME-side eviction (the r8 fix), activeL buffers
    // all 40k lefts while waiting for rights that rarely arrive — the
    // maxActive metric (per-task peak state, one task here) exposes it
    val n = 40000
    val l = List.tabulate(n)(i => ("hot", i * 10L, i * 10L + 9L, i))
      .toDF("k", "s0", "e0", "lid")
    val r = Seq(("hot", 5L, 14L, 900001), ("hot", 200005L, 200014L, 900002),
      ("hot", 399995L, 399999L, 900003)).toDF("k", "rs0", "re0", "rid")
    val native = OverlapJoin.join(l, r, "k",
      "s0", "e0", "rs0", "re0", Seq("rid"))
    // collect from native ITSELF (a derived select would execute a
    // fresh plan whose metrics stay zero); each right overlaps exactly
    // the lefts whose spans touch it
    val got = native.collect()
      .map(r => (r.getAs[Int]("lid"), r.getAs[Int]("rid"))).toSet
    assert(got == Set((0, 900001), (1, 900001),
      (20000, 900002), (20001, 900002), (39999, 900003)))
    // descend through AQE wrappers to the executed node
    def findExec(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[OverlapJoinExec] = p match {
      case e: OverlapJoinExec => Some(e)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findExec(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findExec(q.plan)
      case other => other.children.iterator.flatMap(findExec).nextOption()
    }
    val exec = findExec(native.queryExecution.executedPlan)
      .getOrElse(fail("OverlapJoinExec not in executed plan"))
    val peak = exec.metrics("maxActive").value
    assert(peak > 0 && peak <= 8,
      s"peak buffered intervals $peak: same-side eviction regressed " +
        s"(row-count-bounded state on a one-sided key)")
  }

  test("self-join from one scan (shared exprIds) survives") {
    val i = leftRows.toDF("k", "s0", "e0", "id")
    val got = pairs(OverlapJoin.join(i,
        i.select(col("k"), col("s0").as("rs0"), col("e0").as("re0"),
          col("id").as("rid")),
        "k", "s0", "e0", "rs0", "re0", Seq("rid"))
      .select(col("id").as("lid"), col("rid"))
      .filter(col("lid") < col("rid")))
    val want = (for {
      (ak, as_, ae, aid) <- leftRows
      (bk, bs, be, bid) <- leftRows
      if ak == bk && aid < bid && as_ <= be && bs <= ae
    } yield (aid, bid)).toSet
    assert(got == want)
  }
}
