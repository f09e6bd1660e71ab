package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KCore on hand graphs: pendants peel, chains unravel end-inward one
  * hop per round, cycles survive with their exact degrees, and the
  * surviving set is monotone in rounds. */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int, rounds: Int) =
    KCore.run(edges.toDF("a", "b"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pendant peels, triangle survives with degree 2") {
    // triangle 1-2-3 plus pendant 4 hanging off 1
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
    assert(core(g, 2, 3) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("a chain unravels one hop per round from each end") {
    // path 1-2-3-4-5-6: ends peel first, interior follows
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(core(g, 2, 1).keySet == Set(2L, 3L, 4L, 5L))
    assert(core(g, 2, 2).keySet == Set(3L, 4L))
    assert(core(g, 2, 3).keySet == Set.empty[Long])
  }

  test("two triangles joined by one bridge edge: all six survive the 2-core") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val got = core(g, 2, 3)
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(got(3L) == 3L && got(4L) == 3L) // bridge endpoints keep it
    // ...but the 3-core peels everything: no node has 3 neighbors
    // once the bridge endpoints' triangles go
    assert(core(g, 3, 3).isEmpty)
  }
}
