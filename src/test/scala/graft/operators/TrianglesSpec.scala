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

  test("edgeSupport: K4 edges carry support 2; a pendant edge is absent") {
    // every K4 edge closes exactly 2 of the 4 triangles; the pendant
    // (4,9) closes none and must be ABSENT, not present with 0
    val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)) :+
      (4L, 9L)
    val got = Triangles.edgeSupport(k4.toDF("u", "v"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == (for { a <- 1L to 4L; b <- (a + 1) to 4L }
      yield (a, b, 2L)).toSet)
  }

  test("trussPeel round 1: zero-support edges drop, k=3 truss is stable") {
    // K4 + pendant at k=3 (threshold 1): round 1 peels only the
    // pendant; round 2 removes nothing — a k=3 peel converges after
    // one round because dropping triangle-free edges kills no triangle
    val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)) :+
      (4L, 9L)
    val stats = Triangles.trussPeel(k4.toDF("u", "v"), k = 3, rounds = 2)
    assert(stats == Seq((1, 7L, 4L, 6L), (2, 6L, 4L, 6L)))
  }

  test("trussPeel round 2 recomputes support on the shrunken edge set") {
    // bowtie-core: triangles {1,2,3} and {2,3,4} share edge (2,3)
    // (support 2); the four rim edges have support 1. At k=4
    // (threshold 2) round 1 keeps ONLY (2,3) — and round 2 must then
    // drop it, because its triangles died with the rim: a revert to
    // support-from-round-1 would keep it forever
    val bowtie = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    val stats = Triangles.trussPeel(bowtie.toDF("u", "v"), k = 4, rounds = 2)
    assert(stats == Seq((1, 5L, 2L, 1L), (2, 1L, 0L, 0L)))
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
