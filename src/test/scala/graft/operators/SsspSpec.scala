package graft.operators

import graft.SparkSpec

class SsspSpec extends SparkSpec {
  import spark.implicits._

  test("weighted distances prefer cheap multi-hop paths over one heavy edge") {
    // 1 --10-- 4, but also 1 --2-- 2 --3-- 3 --1-- 4: the 3-edge path
    // costs 6 < 10, so with rounds=3 node 4 settles at 6. Node 5 hangs
    // off 4 (so it needs 4 edges via the cheap path — out of budget —
    // but 2 via the heavy edge: 10+1=11). Island 20-21 unreachable.
    val edges = Seq((1L, 4L, 10L), (1L, 2L, 2L), (2L, 3L, 3L),
      (3L, 4L, 1L), (4L, 5L, 1L), (20L, 21L, 7L)).toDF("u", "v", "w")
    val got = Sssp.run(edges, Seq(1L).toDF("node"), 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 2L, 3L -> 5L, 4L -> 6L, 5L -> 11L))
  }

  test("round budget bounds path length: dist after r rounds = min over <=r edges") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L),
      (1L, 4L, 100L)).toDF("u", "v", "w")
    val r1 = Sssp.run(edges, Seq(1L).toDF("node"), 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 0L, 2L -> 1L, 4L -> 100L))
    val r3 = Sssp.run(edges, Seq(1L).toDF("node"), 3)
      .as[(Long, Long)].collect().toMap
    assert(r3 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("multi-seed takes the minimum over seeds; improvements propagate") {
    // seeds 1 and 6 on a line with uniform weight 2
    val edges = (1L to 5L).map(i => (i, i + 1, 2L)).toDF("u", "v", "w")
    val got = Sssp.run(edges, Seq(1L, 6L).toDF("node"), 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 2L, 3L -> 4L,
      6L -> 0L, 5L -> 2L, 4L -> 4L))
  }

  test("unit weights reduce SSSP to BFS hop levels on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(60)((rnd.nextInt(25).toLong,
      rnd.nextInt(25).toLong)).filter(e => e._1 != e._2).distinct
    val seeds = Seq(0L, 13L).toDF("node")
    val hops = Bfs.run(edges.toDF("a", "b"), seeds, 4)
      .as[(Long, Long)].collect().toMap
    val unit = Sssp.run(edges.map(e => (e._1, e._2, 1L)).toDF("u", "v", "w"),
      seeds, 4).as[(Long, Long)].collect().toMap
    assert(unit == hops)
  }

  test("result is partition-invariant") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(80)((rnd.nextInt(30).toLong,
      rnd.nextInt(30).toLong, (rnd.nextInt(9) + 1).toLong))
      .filter(e => e._1 != e._2).toDF("u", "v", "w")
    val seeds = Seq(3L).toDF("node")
    val one = Sssp.run(edges.coalesce(1), seeds, 3)
      .as[(Long, Long)].collect().toMap
    val many = Sssp.run(edges.repartition(7), seeds, 3)
      .as[(Long, Long)].collect().toMap
    assert(one == many)
  }
}
