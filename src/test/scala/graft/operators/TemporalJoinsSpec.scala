package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Brute-force differential checks for the temporal join operators on
  * synthetic data (the value gate for q57/q58 is the DuckDB oracle; this
  * spec pins the operator semantics independent of the corpus). */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  // (key, tsUs, id): colliding windows, multiple keys, unique (key, ts)
  private val leftRows = List.tabulate(120)(i =>
    (i % 5, (rnd.nextInt(2000) * 2 + 1).toLong, 1000 + i)).distinct
  private val rightRows = List.tabulate(150)(i =>
    (i % 5, (rnd.nextInt(2000) * 2).toLong, 2000 + i))
    .groupBy(t => (t._1, t._2)).map(_._2.head).toList // unique (key, ts)

  private def leftDf = leftRows.toDF("k", "us", "lid")
    .select(col("k"), timestamp_micros(col("us")).as("t"), col("lid"))
  private def rightDf = rightRows.toDF("k", "us", "rid")
    .select(col("k"), timestamp_micros(col("us")).as("t"), col("rid"))

  test("asof matches per-row brute force, including no-match nulls") {
    val got = TemporalJoins.asof(leftDf, rightDf, "k", "t", Seq("rid"))
      .select(col("lid"), col("rid")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    val expect = leftRows.map { case (k, us, lid) =>
      val cands = rightRows.filter(r => r._1 == k && r._2 <= us)
      lid -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
    }.toMap
    assert(got == expect)
  }

  test("range join emits every in-window pair exactly once") {
    val (lo, hi) = (-300L, 500L)
    val got = TemporalJoins.range(leftDf,
        rightDf.withColumnRenamed("rid", "b_rid"), "k", "t",
        lo, hi, Seq("b_rid"))
      .select(col("lid"), col("b_rid")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toList
    val expect = for {
      (k, us, lid) <- leftRows
      (rk, rus, rid) <- rightRows
      if rk == k && rus >= us + lo && rus <= us + hi
    } yield (lid, rid)
    assert(got.sorted == expect.sorted) // exact multiset: no dups, no misses
  }

  test("asof with a null payload field: all columns come from ONE row") {
    // the newest right row has rid2 = null; a per-column last() would
    // stitch rid2 from the older row onto rid from the newer — the
    // struct-payload formulation must return exactly the newest row
    val right = Seq(
      (1, 1L, Some(10), Some(100)),
      (1, 2L, Some(11), None: Option[Int])
    ).toDF("k", "us", "rid", "rid2")
      .select(col("k"), timestamp_micros(col("us")).as("t"),
        col("rid"), col("rid2"))
    val left = Seq((1, 3L, 77)).toDF("k", "us", "lid")
      .select(col("k"), timestamp_micros(col("us")).as("t"), col("lid"))
    val out = TemporalJoins.asof(left, right, "k", "t", Seq("rid", "rid2"))
      .select(col("lid"), col("rid"), col("rid2")).head()
    assert(out.getInt(0) == 77 && out.getInt(1) == 11 && out.isNullAt(2))
  }

  test("nearest matches brute force: tolerance, tie->backward, no-match") {
    val tol = 400L
    val got = TemporalJoins.nearest(leftDf, rightDf, "k", "t",
        Seq("rid"), tol)
      .select(col("lid"), col("rid"), col("gap_us")).collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getLong(2)))))
      .toMap
    val expect = leftRows.map { case (k, us, lid) =>
      val cands = rightRows.filter(r => r._1 == k &&
        math.abs(r._2 - us) <= tol)
      lid -> (if (cands.isEmpty) None else {
        // min |gap|; equal gaps prefer the backward (earlier-ts) row.
        // rightRows is unique per (key, ts), so (gap, side) is total.
        val best = cands.minBy(r => (math.abs(r._2 - us), r._2 > us))
        Some((best._3, math.abs(best._2 - us)))
      })
    }.toMap
    assert(got == expect)
  }

  // (key, start, end, id): varying widths (0 to ~12 bins at binUs=100),
  // touching endpoints (closed-interval inclusivity), disjoint keys
  private val ivlA = List.tabulate(90) { i =>
    val s = rnd.nextInt(3000).toLong
    (i % 4, s, s + rnd.nextInt(1200), 3000 + i)
  }
  private val ivlB = List.tabulate(110) { i =>
    val s = rnd.nextInt(3000).toLong
    (i % 4, s, s + rnd.nextInt(900), 4000 + i)
  }

  test("overlap join emits every intersecting pair exactly once") {
    val a = ivlA.toDF("k", "s0", "e0", "aid")
    val b = ivlB.toDF("k", "bs0", "be0", "bid")
    for (binUs <- Seq(100L, 1L, 10000L)) { // spans≫bin, =1, bin≫spans
      val got = TemporalJoins.overlap(a, b, "k", "s0", "e0",
          "bs0", "be0", binUs, Seq("bid"))
        .select(col("aid"), col("bid")).collect()
        .map(r => (r.getInt(0), r.getInt(1))).toList
      val expect = for {
        (k, s, e, aid) <- ivlA
        (bk, bs, be, bid) <- ivlB
        if bk == k && s <= be && bs <= e
      } yield (aid, bid)
      assert(got.sorted == expect.sorted, s"binUs=$binUs") // exact multiset
    }
  }

  test("overlap self-join under id dedup matches brute-force pairs") {
    val a = ivlA.toDF("k", "s0", "e0", "aid")
    val got = TemporalJoins.overlap(a,
        a.select(col("k"), col("s0").as("bs0"), col("e0").as("be0"),
          col("aid").as("bid")),
        "k", "s0", "e0", "bs0", "be0", 500L, Seq("bid"))
      .filter(col("aid") < col("bid"))
      .select(col("aid"), col("bid")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toList
    val expect = for {
      (k, s, e, aid) <- ivlA
      (bk, bs, be, bid) <- ivlA
      if bk == k && aid < bid && s <= be && bs <= e
    } yield (aid, bid)
    assert(got.sorted == expect.sorted)
  }

  test("asof is partition-count invariant") {
    val base = TemporalJoins.asof(leftDf, rightDf, "k", "t", Seq("rid"))
      .collect().map(_.toSeq).toSet
    val repart = TemporalJoins.asof(leftDf.repartition(7),
        rightDf.repartition(3), "k", "t", Seq("rid"))
      .collect().map(_.toSeq).toSet
    assert(base == repart)
  }
}
