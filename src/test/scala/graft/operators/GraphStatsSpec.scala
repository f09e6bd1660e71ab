package graft.operators

import graft.SparkSpec

/** Hand-graph pins for the assortativity moments (q207's core): exact
  * BIGINT moments and known correlation signs/values. */
class GraphStatsSpec extends SparkSpec {
  import spark.implicits._

  private def row(edges: Seq[(Long, Long)]) =
    GraphStats.assortativity(edges.toDF("u1", "u2")).head()

  test("star graph: perfectly disassortative (r = -1) with exact moments") {
    // center 1, leaves 2..5: every directed pair joins deg 4 to deg 1
    val r = row((2L to 5L).map(l => (1L, l)))
    // n=8 directed pairs; sx = 4*(4+1) = 20; sxy = 8*4 = 32;
    // sxx = 4*(16+1) = 68
    assert(r.getLong(0) == 8L && r.getLong(1) == 20L &&
      r.getLong(2) == 32L && r.getLong(3) == 68L)
    assert(math.abs(r.getDouble(4) - (-1.0)) < 1e-12)
  }

  test("path P4: r = -0.5 by hand") {
    // degrees 1,2,2,1: moments n=6 sx=sy=10 sxy=16 sxx=syy=18 →
    // (6*16-100)/(sqrt(8)*sqrt(8)) = -4/8
    val r = row(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(r.getLong(0) == 6L && r.getLong(1) == 10L &&
      r.getLong(2) == 16L && r.getLong(3) == 18L)
    assert(math.abs(r.getDouble(4) - (-0.5)) < 1e-12)
  }

  test("degree-regular graph yields NULL (DuckDB's 0/0 convention)") {
    // a 4-cycle: every degree 2 → zero variance on both sides; the
    // oracle's float division by zero renders NULL, so the guarded
    // division must too (ANSI Spark would otherwise throw)
    val r = row(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))
    assert(r.isNullAt(4))
  }

  test("like-with-like wiring is perfectly assortative (r = +1)") {
    // disjoint K3 (all deg 2) + isolated edge (both deg 1): every edge
    // joins equal degrees → n=8 sx=14 sxy=26 sxx=26, r = 12/12 = 1
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (7L, 8L))
    val r = row(g)
    assert(r.getLong(0) == 8L && r.getLong(1) == 14L &&
      r.getLong(2) == 26L && r.getLong(3) == 26L)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
  }

  // ---- communityQuality (q219's core) -------------------------------

  private def quality(edges: Seq[(Long, Long)], labels: Seq[(Long, Long)]) =
    GraphStats.communityQuality(
      edges.toDF("u", "v"), labels.toDF("node", "community"))
      .orderBy("community").collect()

  test("two triangles + one bridge: modularity and conductance by hand") {
    // K3 {1,2,3} + K3 {4,5,6} bridged by (3,4): m=7. Per community:
    // intra=3, cut=1, vol=7, Q_c = 3/7 − (7/14)² = 5/28,
    // φ_c = 1/min(7, 14−7) = 1/7.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val labels = Seq(1L -> 10L, 2L -> 10L, 3L -> 10L,
      4L -> 20L, 5L -> 20L, 6L -> 20L)
    val rs = quality(edges, labels)
    assert(rs.length == 2)
    for (r <- rs) {
      assert(r.getLong(1) == 3L)       // n_nodes
      assert(r.getLong(2) == 3L)       // intra_edges
      assert(r.getLong(3) == 1L)       // cut_edges
      assert(r.getLong(4) == 7L)       // vol = 2*3 + 1
      assert(math.abs(r.getDouble(5) - (3.0 / 7.0 - 0.25)) < 1e-15)
      assert(math.abs(r.getDouble(6) - 1.0 / 7.0) < 1e-15)
    }
  }

  test("one community owning every edge: Q = 0, conductance NULL") {
    // all of K3 in one community: intra=m=3, vol=2m → Q = 1 − 1 = 0
    // and min(vol, 2m−vol) = 0 → conductance undefined (NULL, the
    // DuckDB NULLIF convention the oracle states)
    val rs = quality(Seq((1L, 2L), (1L, 3L), (2L, 3L)),
      Seq(1L -> 9L, 2L -> 9L, 3L -> 9L))
    assert(rs.length == 1)
    assert(rs(0).getLong(2) == 3L && rs(0).getLong(3) == 0L &&
      rs(0).getLong(4) == 6L)
    assert(rs(0).getDouble(5) == 0.0)
    assert(rs(0).isNullAt(6))
  }

  test("singleton community on a bridge endpoint: negative modularity") {
    // path 1-2, 2-3 with {2} alone: m=2; community {2}: intra=0, cut=2,
    // vol=2, Q = 0 − (2/4)² = −0.25, φ = 2/min(2,2) = 1
    val rs = quality(Seq((1L, 2L), (2L, 3L)),
      Seq(1L -> 1L, 3L -> 1L, 2L -> 2L))
    val c2 = rs.find(_.getLong(0) == 2L).get
    assert(c2.getLong(1) == 1L && c2.getLong(2) == 0L &&
      c2.getLong(3) == 2L && c2.getLong(4) == 2L)
    assert(math.abs(c2.getDouble(5) - (-0.25)) < 1e-15)
    assert(math.abs(c2.getDouble(6) - 1.0) < 1e-15)
    // the {1,3} community: intra=0 (1-3 is not an edge), cut=2, vol=2
    val c1 = rs.find(_.getLong(0) == 1L).get
    assert(c1.getLong(2) == 0L && c1.getLong(3) == 2L)
  }
}
