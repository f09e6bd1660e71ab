package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q182's allocation core against an independent iterative reference:
  * the greedy ascending water-fill (allocate the smallest supply fully
  * while it fits the fair share, then split the remainder div/mod) on
  * adversarial supply mixes — heavy skew so the capped branch actually
  * fires, ties, zero supplies, and a randomized sweep. The claim under
  * test is the prefix property: the one-pass window condition must pick
  * exactly the capped set the iteration picks. */
class WaterfillSpec extends SparkSpec {
  import spark.implicits._

  /** Iterative greedy reference (the definition). */
  private def reference(sup: Seq[(String, Long)])
      : Map[String, (Boolean, Long)] = {
    val budget = 3L * sup.map(_._2).sum / 5L
    val asc = sup.sortBy(t => (t._2, t._1))
    var remaining = budget
    var left = asc.size
    val capped = scala.collection.mutable.Map.empty[String, (Boolean, Long)]
    var idx = 0
    // cap while the smallest supply fits the current fair share
    while (idx < asc.size && asc(idx)._2 * left <= remaining) {
      capped(asc(idx)._1) = (true, asc(idx)._2)
      remaining -= asc(idx)._2; left -= 1; idx += 1
    }
    if (left > 0) {
      val level = remaining / left
      val rem = remaining % left
      asc.drop(idx).zipWithIndex.foreach { case ((s, _), j) =>
        capped(s) = (false, level + (if (j < rem) 1L else 0L))
      }
    }
    capped.toMap
  }

  private def run(sup: Seq[(String, Long)]): Map[String, (Boolean, Long)] =
    Profiling.waterfill(sup.toDF("source", "supply"))
      .collect()
      .map(r => r.getString(0) -> (r.getBoolean(2), r.getLong(3))).toMap

  test("heavy skew: small sources capped, giants share the level") {
    val sup = Seq("tiny" -> 10L, "small" -> 50L, "mid" -> 1000L,
      "big" -> 100000L, "huge" -> 900000L)
    val got = run(sup)
    assert(got == reference(sup))
    assert(got("tiny") == (true, 10L) && got("small") == (true, 50L))
    // big (100k) sits BELOW the fair share of the post-cap remainder, so
    // it caps too; only the 900k giant takes the level
    assert(got("big") == (true, 100000L))
    assert(!got("huge")._1 && got("huge")._2 < 900000L)
    assert(got.values.map(_._2).sum == 3L * sup.map(_._2).sum / 5L)
  }

  test("ties, zeros, and a single source") {
    for (sup <- Seq(
        Seq("a" -> 0L, "b" -> 0L, "c" -> 100L, "d" -> 100L, "e" -> 100L),
        Seq("only" -> 77L),
        Seq("a" -> 5L, "b" -> 5L, "c" -> 5L))) {
      assert(run(sup) == reference(sup), s"mismatch on $sup")
    }
  }

  test("randomized sweep: one-pass window == iterative greedy") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 2 + rnd.nextInt(30)
      val sup = (0 until n).map(i =>
        s"s$i" -> (if (rnd.nextBoolean()) rnd.nextInt(100).toLong
                   else rnd.nextInt(1000000).toLong))
      val got = run(sup)
      val want = reference(sup)
      assert(got == want, s"trial $trial: $sup\ngot=$got\nwant=$want")
      assert(got.values.map(_._2).sum == 3L * sup.map(_._2).sum / 5L)
      assert(got.forall { case (s, (_, a)) =>
        a <= sup.toMap.apply(s) }, "allocation exceeded a supply")
    }
  }
}
