package graft.operators

import graft.SparkSpec

/** ConnectedComponents vs a union-find model on random graphs. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(5)

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(x => x -> find(x)).toMap
  }

  test("matches union-find on random graphs, incl. chains and isolates") {
    for (round <- 1 to 3) {
      val edges = (1 to 60).map(_ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2) ++
        // a long chain stresses multi-iteration propagation
        (100L to 110L).sliding(2).map(s => (s(1), s.head)).toSeq
      val expect = unionFind(40, edges)
      val got = ConnectedComponents.run(edges.toDF("u", "v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"round $round")
    }
  }
}
