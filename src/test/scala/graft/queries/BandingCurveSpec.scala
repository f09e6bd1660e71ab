package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The banding tuning curves, cross-pinned (round-10 ask #5): q203's
  * exact-truth grid left the query ledger — q209's sampled grading
  * carries the slot — so THIS spec is where the exact grid lives on as
  * ground truth. At the gate SFs it pins:
  *
  *  - the candidate side is IDENTICAL (n_cand per grid config — the
  *    sampled curve tunes the real full-corpus index, only its grading
  *    is sampled);
  *  - the seeded-sample truth is exactly the full truth restricted to
  *    the sample (the regime where the two-stage estimator is
  *    unbiased; the df-cap could in principle split them on an
  *    adversarial corpus, so the equality is ASSERTED, not assumed);
  *  - the estimator's internal identity (recall_ppm_est =
  *    1e6·n_hit div n_true, hits bounded by both sides), and the
  *    theorem pin: a config whose EXACT recall is total must grade
  *    total on the sample too (sampled truth ⊆ full truth ⊆ candidates
  *    there).
  */
class BandingCurveSpec extends SparkSpec {
  import spark.implicits._

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("q209's sampled estimator agrees with the exact q203 grid") {
    for (dir <- dirs) {
      val exact = Dedup.bandingCurveExact(spark, dir)
        .as[(Int, Int, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      val sampled = graft.SparkEntry
        .queries("q209_banding_curve_sampled")(spark, dir)
        .as[(Int, Int, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      assert(exact.keySet == Set(2, 4, 8) && sampled.keySet == Set(2, 4, 8))
      for (b <- exact.keySet) {
        val (_, rE, nCandE, nTrue, nHitE, _, recallE) = exact(b)
        val (_, rS, nCandS, nTrueS, nHitS, recallEst) = sampled(b)
        assert(rE == rS, s"$dir bands=$b grid configs diverged")
        assert(nCandE == nCandS,
          s"$dir bands=$b candidate sets diverged: exact $nCandE " +
            s"vs sampled $nCandS — the sampled curve must tune the " +
            "REAL index")
        assert(nHitS <= math.min(nCandS, nTrueS) && nHitE <= nTrue)
        assert(recallEst == 1000000L * nHitS / math.max(nTrueS, 1L),
          s"$dir bands=$b estimator identity broken")
        if (recallE == 1000000L && nTrueS > 0L)
          assert(recallEst == 1000000L,
            s"$dir bands=$b exact recall is total but the sample " +
              s"grading missed pairs (est $recallEst) — sampled truth " +
              "escaped the candidate set")
      }
    }
  }

  test("the seeded-sample truth is the full truth restricted to the sample") {
    val m = Dedup.TruthSampleMod
    for (dir <- dirs) {
      val full = Dedup.jaccardPairs(spark, dir)
        .select(col("a_id"), col("b_id"))
        .as[(Long, Long)].collect().toSet
      val sampledTruth = Dedup.jaccardPairs(spark, dir, Some(m))
        .select(col("a_id"), col("b_id"))
        .as[(Long, Long)].collect().toSet
      val restricted = full.filter(p => p._1 % m == 0 && p._2 % m == 0)
      assert(sampledTruth == restricted,
        s"$dir: pipeline-on-sample truth != full truth ∩ sample " +
          s"(${sampledTruth.size} vs ${restricted.size}) — the df-cap " +
          "edge bit; the estimator's unbiasedness note needs revisiting")
    }
  }
}
