package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PositionalBoundedPairs (PPJoin positional filter fused on top of the
  * length filter) — unit semantics against hand cases and the
  * LengthBoundedPairs reference, then the corpus-level losslessness
  * pin: over the real shingle pipeline at the gate SFs the positional
  * candidate set is a SUBSET of the length-only one, yet the exact
  * Jaccard verification of both yields IDENTICAL final pairs — the
  * filter drops only provably-dead candidates (q120's oracle
  * differential re-proves the same against DuckDB ground truth every
  * round; this spec pins it variant-vs-variant with the emission
  * volumes on record).
  */
class PositionalBoundedPairsSpec extends SparkSpec {
  import spark.implicits._

  private val IdBits = LengthBoundedPairs.IdBits

  private def pack(sz: Long, id: Long): Long = (sz << IdBits) | id

  test("prunes exactly the co-occurrences whose positional bound is dead") {
    val tau = 0.5
    // both docs size 4, required overlap = tau/(1+tau)*(4+4) = 8/3:
    //   at positions (1,1): ub = 1 + min(3,3) = 4 >= 8/3  -> emitted
    //   at positions (3,3): ub = 1 + min(1,1) = 2 <  8/3  -> pruned
    val survives = Seq((1, Seq((pack(4, 100), 1), (pack(4, 200), 1))))
      .toDF("g", "ds")
      .select(PositionalBoundedPairs(col("ds"), tau).as(Seq("a", "b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(survives == Set((100L, 200L)))
    val pruned = Seq((1, Seq((pack(4, 100), 3), (pack(4, 200), 3))))
      .toDF("g", "ds")
      .select(PositionalBoundedPairs(col("ds"), tau).as(Seq("a", "b")))
      .collect()
    assert(pruned.isEmpty)
    // the length filter still applies under a passing positional bound:
    // sizes (3, 9) die on size ratio alone whatever the positions
    val lenDead = Seq((1, Seq((pack(3, 100), 1), (pack(9, 200), 1))))
      .toDF("g", "ds")
      .select(PositionalBoundedPairs(col("ds"), tau).as(Seq("a", "b")))
      .collect()
    assert(lenDead.isEmpty)
  }

  test("boundary co-occurrence (bound exactly at the requirement) is kept") {
    val tau = 0.5
    // sizes (2, 4): requirement = (1/3)*6 = 2; at positions (1, 3):
    // ub = 1 + min(2-1, 4-3) = 2 — EXACTLY the requirement; the prune
    // compares 2*1.5 = 3 >= 0.5*6 = 3, exact in double, kept. A true
    // pair with overlap exactly at the threshold depends on this.
    val got = Seq((1, Seq((pack(2, 100), 1), (pack(4, 200), 3))))
      .toDF("g", "ds")
      .select(PositionalBoundedPairs(col("ds"), tau).as(Seq("a", "b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 200L)))
  }

  test("subset of LengthBoundedPairs on random positioned lists") {
    val rnd = new scala.util.Random(17)
    val tau = 0.5
    val rows = (1 to 80).map { i =>
      val n = rnd.nextInt(14)
      val entries = (0 until n).map { _ =>
        val sz = rnd.nextInt(40).toLong + 1
        (sz, rnd.nextInt(100000).toLong, rnd.nextInt(sz.toInt) + 1)
      }.distinctBy(_._2)
      (i, entries.map { case (sz, id, p) => (pack(sz, id), p) }
        .sortBy(_._1))
    }
    val df = rows.toDF("g", "ds").filter(size(col("ds")) >= 2)
    val pos = df
      .select(col("g"), PositionalBoundedPairs(col("ds"), tau)
        .as(Seq("a", "b")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val dfLen = rows.map { case (i, lst) => (i, lst.map(_._1)) }
      .toDF("g", "dl").filter(size(col("dl")) >= 2)
    val len = dfLen
      .select(col("g"), LengthBoundedPairs(col("dl"), tau).as(Seq("a", "b")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(pos.subsetOf(len),
      s"positional emitted ${pos.diff(len).size} pairs the length filter never would")
    // and the pruned ones are genuinely dead: re-derive the bound in
    // plain Scala over every length-surviving pair of every list
    val byG = rows.toMap
    for ((g, a, b) <- len.diff(pos)) {
      val lst = byG(g)
      val ea = lst.find(e => (e._1 & ((1L << IdBits) - 1)) == a).get
      val eb = lst.find(e => (e._1 & ((1L << IdBits) - 1)) == b).get
      val (na, pa) = (ea._1 >>> IdBits, ea._2.toLong)
      val (nb, pb) = (eb._1 >>> IdBits, eb._2.toLong)
      val ub = 1L + math.min(na - pa, nb - pb)
      assert(ub * (1.0 + tau) < tau * (na + nb),
        s"g=$g pair ($a,$b) was pruned but its bound $ub is alive")
    }
  }

  test("rational decomposition is exact; geProd matches BigInt") {
    // every finite double is dyadic, so p/q must reproduce the double's
    // exact value — including non-"round" taus like 0.7 whose reduced
    // numerator carries the full 52-bit mantissa (ADVICE r13)
    for (tau <- Seq(0.5, 0.25, 0.75, 0.6875, 0.7, 0.8, 0.123456789, 1.0)) {
      val (p, q) = LengthBoundedPairs.rational(tau)
      // q is a power of two, so the division terminates and java's
      // BigDecimal.divide is exact (scala's / would round at 34 digits)
      assert(new java.math.BigDecimal(p).divide(new java.math.BigDecimal(q))
        .compareTo(new java.math.BigDecimal(tau)) == 0,
        s"tau=$tau decomposed to $p/$q")
    }
    intercept[IllegalArgumentException](LengthBoundedPairs.rational(1.0 / 4096))
    intercept[IllegalArgumentException](LengthBoundedPairs.rational(1.5))
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5000) {
      // operand regimes the prunes actually hit: sizes/overlaps up to
      // 2^23 against rational parts up to 2^62
      val a = rnd.nextLong(1L << 23); val c = rnd.nextLong(1L << 23)
      val b = rnd.nextLong(1L << 62); val d = rnd.nextLong(1L << 62)
      assert(LengthBoundedPairs.geProd(a, b, c, d) ==
        (BigInt(a) * BigInt(b) >= BigInt(c) * BigInt(d)),
        s"geProd($a,$b,$c,$d)")
    }
  }

  test("non-dyadic tau = 0.7: generator matches a BigInt reference, boundary kept") {
    val tau = 0.7
    val (p, q) = LengthBoundedPairs.rational(tau)
    def refPairs(lst: Seq[(Long, Int)]): Set[(Long, Long)] = {
      // the generator's iteration semantics re-derived in BigInt: sizes
      // ascend, inner scan breaks at the first too-long partner, then
      // the positional bound decides
      val out = scala.collection.mutable.Set[(Long, Long)]()
      for (i <- lst.indices; j <- i + 1 until lst.size) {
        val (na, pa) = (lst(i)._1 >>> IdBits, lst(i)._2.toLong)
        val (nb, pb) = (lst(j)._1 >>> IdBits, lst(j)._2.toLong)
        if (BigInt(na) * q >= BigInt(nb) * p) { // not length-dead
          val ub = 1L + math.min(na - pa, nb - pb)
          if (BigInt(ub) * (BigInt(p) + BigInt(q)) >=
              BigInt(p) * BigInt(na + nb)) {
            val a = lst(i)._1 & ((1L << IdBits) - 1)
            val b = lst(j)._1 & ((1L << IdBits) - 1)
            out += ((math.min(a, b), math.max(a, b)))
          }
        }
      }
      out.toSet
    }
    val rnd = new scala.util.Random(29)
    val rows = (1 to 60).map { i =>
      val n = rnd.nextInt(12)
      val entries = (0 until n).map { _ =>
        val sz = rnd.nextInt(30).toLong + 1
        (sz, rnd.nextInt(100000).toLong, rnd.nextInt(sz.toInt) + 1)
      }.distinctBy(_._2)
      (i, entries.map { case (sz, id, pp) => (pack(sz, id), pp) }
        .sortBy(_._1))
    }
    val got = rows.toDF("g", "ds").filter(size(col("ds")) >= 2)
      .select(col("g"),
        PositionalBoundedPairs(col("ds"), tau).as(Seq("a", "b")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    for ((g, lst) <- rows if lst.size >= 2) {
      assert(got.getOrElse(g, Set.empty) == refPairs(lst),
        s"list $g diverges from the BigInt reference at tau=$tau")
    }
    // the FP-hazard case the exact compare exists for: sizes (7, 10) at
    // tau = 0.7 make the length test 7*q vs 10*p with 10*0.7 NOT exact
    // in double (0.7 rounds up, 10*0.7 = 7.000000000000001 > 7 in FP,
    // which would kill the pair); exactly, 10p/q > 7 too — so the pair
    // IS length-dead, and both arithmetics agree here. The true
    // boundary: sizes (7, 10) need overlap ceil(0.7/1.7*17) = 7 with
    // ub = 1 + min(7-1, 10-4) = 7 — kept, exactly at the requirement.
    val kept = Seq((1, Seq((pack(10, 100), 4), (pack(14, 200), 2))))
      .toDF("g", "ds")
      .select(PositionalBoundedPairs(col("ds"), tau).as(Seq("a", "b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // sizes (10, 14): length test 10*q >= 14*p (10/14 ≈ 0.714 >= 0.7 ✓);
    // requirement ub*(p+q) >= p*24; ub = 1 + min(10-4, 14-2) = 7;
    // BigInt: 7*(p+q) vs p*24 — with p/q = 0.7: 7*1.7 = 11.9 >= 16.8?
    // no — dead. Positions (1,1): ub = 1 + min(9,13) = 10;
    // 10*1.7 = 17 >= 16.8 ✓ kept.
    assert(kept.isEmpty)
    val kept2 = Seq((1, Seq((pack(10, 100), 1), (pack(14, 200), 1))))
      .toDF("g", "ds")
      .select(PositionalBoundedPairs(col("ds"), tau).as(Seq("a", "b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept2 == Set((100L, 200L)))
  }

  test("non-dyadic tau = 0.7: q120RawPairs stays lossless (brute-force truth)") {
    // tiny synthetic corpus with enough near-dups to cross the 0.7 bar;
    // losslessness = every true pair (J >= tau) appears among the
    // generator's candidates — the property the exact prefix/prune
    // arithmetic protects at non-dyadic taus
    val tau = 0.7
    val rnd = new scala.util.Random(41)
    val vocab = (0 until 40).map(i => s"t$i")
    val originals = (0L until 60L).map { id =>
      val toks = (0 until (6 + rnd.nextInt(10)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).distinct
      (id, toks)
    }
    val nearDups = (60L until 80L).map { id =>
      // near-dup of an earlier doc: drop at most one token
      val src = originals((id - 60).toInt)._2
      (id, if (src.size > 1 && rnd.nextBoolean()) src.tail else src)
    }
    val docs = originals ++ nearDups
    val base = docs.toDF("doc_id", "sh")
    val cands = graft.queries.Dedup.q120RawPairs(base, tau)
      .distinct().as[(Long, Long)].collect().toSet
    val byId = docs.toMap
    val truth = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      sa = byId(a).toSet; sb = byId(b).toSet
      inter = sa.intersect(sb).size
      if sa.nonEmpty && sb.nonEmpty &&
        inter.toDouble / (sa.size + sb.size - inter) >= tau
    } yield (a, b)).toSet
    assert(truth.subsetOf(cands),
      s"lossless violated at tau=$tau: ${truth.diff(cands).size} true " +
        "pairs missing from the candidate set")
    info(s"tau=$tau: ${cands.size} candidates cover ${truth.size} true pairs")
  }

  test("corpus-level: positional ⊆ length-only candidates, identical verified pairs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val base = graft.queries.Dedup.shingledFrame(spark, dir)
      base.persist(); base.count()
      try {
        val lenC = graft.queries.Dedup
          .q120RawPairs(base, 0.5, positional = false).distinct()
        val posC = graft.queries.Dedup
          .q120RawPairs(base, 0.5, positional = true).distinct()
        val lenSet = lenC.as[(Long, Long)].collect().toSet
        val posSet = posC.as[(Long, Long)].collect().toSet
        assert(posSet.subsetOf(lenSet),
          s"$dir: positional candidates escaped the length-only set")
        def verified(c: Set[(Long, Long)]): Set[(Long, Long)] = {
          val sets = base.select(col("doc_id"), col("sh"))
            .as[(Long, Seq[String])].collect().toMap
          c.filter { case (a, b) =>
            val (sa, sb) = (sets(a), sets(b))
            val inter = sa.toSet.intersect(sb.toSet).size
            inter.toDouble / (sa.size + sb.size - inter) >= 0.5
          }
        }
        val vl = verified(lenSet)
        val vp = verified(posSet)
        assert(vl == vp,
          s"$dir: the positional filter dropped a TRUE pair — " +
            s"${(vl diff vp).size} missing")
        info(s"$dir: candidates ${lenSet.size} -> ${posSet.size} " +
          s"(${vl.size} true pairs in both)")
      } finally { base.unpersist(blocking = false); () }
    }
  }
}
