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
