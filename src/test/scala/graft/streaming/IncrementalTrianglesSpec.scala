package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Triangles

/** IncrementalTriangles: running census equals the batch operator over
  * every prefix, whatever the batching, arrival order, duplication, or
  * re-delivery; re-seed restores the contract. */
class IncrementalTrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def batchCount(edges: Seq[(Long, Long)]): Long =
    if (edges.isEmpty) 0L
    else Triangles.run(edges.toDF("u", "v")).count()

  private def canon(edges: Seq[(Long, Long)]): Seq[(Long, Long)] =
    edges.filter(e => e._1 != e._2)
      .map(e => (e._1 min e._2, e._1 max e._2)).distinct

  test("prefix parity with the batch operator across random batchings") {
    val rnd = new scala.util.Random(31)
    val g = canon(Seq.fill(260)(
      (rnd.nextInt(28).toLong, rnd.nextInt(28).toLong)))
    val shuffled = rnd.shuffle(g)
    val inc = new IncrementalTriangles
    var seen = Seq.empty[(Long, Long)]
    var off = 0
    while (off < shuffled.size) {
      val n = 1 + rnd.nextInt(60)
      val b = shuffled.slice(off, off + n)
      off += n
      seen ++= b
      // reversed orientation + duplicated rows: must not change anything
      val noisy = b ++ b.take(3).map(e => (e._2, e._1))
      inc.update(noisy.toDF("u", "v"))
      assert(inc.totalTriangles == batchCount(seen),
        s"prefix of ${seen.size} edges")
      assert(inc.totalEdges == seen.size.toLong)
    }
  }

  test("re-delivered batches close nothing; self-loops are dropped") {
    val inc = new IncrementalTriangles
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 4L))
    assert(inc.update(tri.toDF("u", "v")) == 1L)
    assert(inc.update(tri.toDF("u", "v")) == 0L) // full re-delivery
    assert(inc.totalTriangles == 1L)
    assert(inc.totalEdges == 3L) // the self-loop never counted
  }

  test("a batch whose edges multiply-close counts each triangle once") {
    // wheel: spokes first (no triangles), then the rim arrives in ONE
    // batch — every rim edge closes a triangle with two old spokes, and
    // adjacent rim edges share the hub wedge; K4 core checks 2/3-fresh
    val inc = new IncrementalTriangles
    val spokes = (1L to 6L).map(h => (0L, h))
    assert(inc.update(spokes.toDF("u", "v")) == 0L)
    val rim = (1L to 5L).map(i => (i, i + 1)) :+ (6L, 1L)
    assert(inc.update(rim.toDF("u", "v")) == 6L)
    assert(inc.totalTriangles ==
      batchCount(canon(spokes ++ rim)))
  }

  test("reseed from a snapshot restores the running contract") {
    val rnd = new scala.util.Random(7)
    val g = canon(Seq.fill(120)(
      (rnd.nextInt(18).toLong, rnd.nextInt(18).toLong)))
    val (first, rest) = g.splitAt(g.size / 2)
    val inc = new IncrementalTriangles
    inc.update(first.toDF("u", "v"))
    val snap = inc.edgeSnapshot.get
    val resumed = new IncrementalTriangles
    resumed.reseed(snap, inc.totalTriangles)
    resumed.update(rest.toDF("u", "v"))
    assert(resumed.totalTriangles == batchCount(g))
    assert(resumed.totalEdges == g.size.toLong)
  }
}
