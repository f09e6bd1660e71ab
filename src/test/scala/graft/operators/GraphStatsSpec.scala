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
}
