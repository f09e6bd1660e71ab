package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential tests for [[PageRank]]: the distributed ranks must equal
  * a single-threaded integer reference exactly (both are pure integer
  * recurrences — no tolerance), stay invariant under input partitioning,
  * and respect the hand-checkable structure of a known graph. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Single-threaded exact integer PageRank, the operator's ground
    * truth: same micro-unit init, div contributions, 85/100 damping,
    * and the same full-node-set rebuild each round (an in-degree-0
    * source keeps the bare damping term, never drops out). */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = deg.keySet
    var r: Map[Long, Long] = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = nodes.map(n => n -> (150000L + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  // undirected triangle 1-2-3 plus a pendant 4 attached to 1: node 1 has
  // the highest centrality, the symmetric pair 2/3 tie, 4 is lowest
  private val graph = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L,
    1L -> 3L, 3L -> 1L, 1L -> 4L, 4L -> 1L)

  test("ranks equal the single-threaded integer reference exactly") {
    val got = PageRank.run(graph.toDF("src", "dst"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === reference(graph, 3))
    assert(got(1L) > got(2L), "hub must outrank triangle members")
    assert(got(2L) === got(3L), "symmetric nodes must tie exactly")
    assert(got(4L) < got(2L), "pendant must rank lowest")
  }

  test("directed graph: an in-degree-0 source keeps the damping floor") {
    // 1<->2 plus 3->1: node 3 has an out-edge (contract ok) but nothing
    // points at it - it must stay at 150000 and KEEP feeding node 1,
    // not silently drop out of the result
    val directed = Seq(1L -> 2L, 2L -> 1L, 3L -> 1L)
    val got = PageRank.run(directed.toDF("src", "dst"), iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got === reference(directed, 2))
    assert(got.keySet === Set(1L, 2L, 3L), "every source must stay in the result")
    assert(got(3L) === 150000L, "in-degree-0 node holds the damping floor")
    // round 2's node 1 mass includes 3's floor contribution: dropping 3
    // would yield 150000 + 85*1000000/100 instead
    assert(got(1L) === 150000L + 85L * (1000000L + 150000L) / 100L)
  }

  test("a sink destination (no out-edge) fails loud, not silently leaks") {
    // 1->2, 2->3, 3 never a source: its received mass would vanish from
    // the system - the contract guard must reject the graph up front
    val sink = Seq(1L -> 2L, 2L -> 3L)
    val ex = intercept[IllegalArgumentException] {
      PageRank.run(sink.toDF("src", "dst"), iters = 1).collect()
    }
    assert(ex.getMessage.contains("no out-edge"))
  }

  test("ranks are invariant under input partitioning") {
    val one = PageRank.run(graph.toDF("src", "dst").coalesce(1), 3)
      .as[(Long, Long)].collect().toSet
    val many = PageRank.run(graph.toDF("src", "dst").repartition(7), 3)
      .as[(Long, Long)].collect().toSet
    assert(one === many)
  }

  test("mass stays bounded: every rank in [150000, n * 1e6]") {
    val n = graph.map(_._1).distinct.size
    val ranks = PageRank.run(graph.toDF("src", "dst"), 3)
      .as[(Long, Long)].collect()
    assert(ranks.forall { case (_, pr) =>
      pr >= 150000L && pr <= n * 1000000L })
  }

  // ---- runPersonalized (q221's core) --------------------------------

  test("personalized restart: path 1-2-3 seeded at 1, two rounds by hand") {
    // symmetric path edges; deg(1)=1, deg(2)=2, deg(3)=1; seed {1}.
    // r0 = (1e6, 0, 0)
    // r1: n1 = 150000 + 0; n2 = 0 + 85*(1e6 div 1) div 100 = 850000;
    //     n3 = 0
    // r2: n1 = 150000 + 85*(850000 div 2) div 100 = 511250;
    //     n2 = 0 + 85*150000 div 100 = 127500;
    //     n3 = 0 + 85*425000 div 100 = 361250
    val path = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L)
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val r1 = PageRank.runPersonalized(path.toDF("src", "dst"), seeds, 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 === Map(1L -> 150000L, 2L -> 850000L, 3L -> 0L))
    val r2 = PageRank.runPersonalized(path.toDF("src", "dst"), seeds, 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 === Map(1L -> 511250L, 2L -> 127500L, 3L -> 361250L))
  }

  test("personalized with ALL nodes seeded equals uniform run") {
    val nodes = graph.map(_._1).distinct.map(Tuple1(_)).toDF("node")
    val uni = PageRank.run(graph.toDF("src", "dst"), 3)
      .as[(Long, Long)].collect().toSet
    val per = PageRank.runPersonalized(graph.toDF("src", "dst"), nodes, 3)
      .as[(Long, Long)].collect().toSet
    assert(uni === per)
  }

  test("seed ids outside the node set are ignored") {
    val path = Seq(1L -> 2L, 2L -> 1L)
    val seeds = Seq(99L, 1L).map(Tuple1(_)).toDF("node")
    val r = PageRank.runPersonalized(path.toDF("src", "dst"), seeds, 1)
      .as[(Long, Long)].collect().toMap
    // only node 1 restarts; 99 contributes nothing and never appears
    assert(r === Map(1L -> 150000L, 2L -> 850000L))
  }
}
