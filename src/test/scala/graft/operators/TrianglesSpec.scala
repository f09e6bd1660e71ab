package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val es = edges.toSet
    def has(a: Long, b: Long) = es((a min b, a max b))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    (for {
      a <- nodes; b <- nodes if a < b && has(a, b)
      c <- nodes if b < c && has(a, c) && has(b, c)
    } yield (a, b, c)).toSet
  }

  private def run(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
    Triangles.run(edges.toDF("u", "v"))
      .as[(Long, Long, Long)].collect().toSet

  test("enumerates each triangle exactly once on known fixtures") {
    // K4 has 4 triangles; a pendant vertex adds none
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    assert(run(k4 :+ (4L, 9L)) ==
      Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    // a 5-cycle is triangle-free
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L))).isEmpty)
  }

  test("matches brute-force enumeration on random graphs, incl. skewed hubs") {
    // the hub graph exercises the orientation bound: node 0 touches
    // everything, so an unoriented wedge join would pivot on it
    val rnd = new scala.util.Random(11)
    val dense = Seq.fill(220)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2).map(e => (e._1 min e._2, e._1 max e._2))
      .distinct
    val hub = (1L to 25L).map(i => (0L, i)) ++
      Seq.fill(40)((1L + rnd.nextInt(25), 1L + rnd.nextInt(25)))
        .filter(e => e._1 != e._2).map(e => (e._1 min e._2, e._1 max e._2))
        .distinct
    for (g <- Seq(dense, hub)) {
      val want = brute(g)
      val got = run(g)
      assert(got == want, s"triangle sets diverge: got ${got.size}, want ${want.size}")
    }
  }
}
