package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BfsSpec extends SparkSpec {
  import spark.implicits._

  test("hop levels are exact shortest distances on a built graph") {
    // path 1-2-3-4-5-6, a triangle 10-11-12 touching it at 3 (10-3),
    // and an unreachable island 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (10L, 12L), (10L, 3L), (20L, 21L))
      .toDF("a", "b")
    val seeds = Seq(1L).toDF("node")
    val got = Bfs.run(edges, seeds, 3)
      .as[(Long, Long)].collect().toMap
    // distances from 1: 1→0, 2→1, 3→2, 4→3, 10→3; 5/11/12 are 4+ hops,
    // island unreachable
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 10L -> 3L))
  }

  test("levels match a reference BFS on the sf0.001 near-dup graph") {
    val pairs = graft.SparkEntry.queries("q134_bfs_radius")(
      spark, "/root/testdata/sf0.001")
      .as[(Long, Long)].collect().toMap
    // reference BFS over the same edges, seeds = nodes % 29 == 0
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        graft.plans.WordShingles(col("text"), 3, distinct = true).as("sh"))
      .as[(Long, Seq[String])].collect().toSeq
      .filter(_._2.nonEmpty)
    // mirror the q36 candidate semantics: intersections count only
    // shingles with document frequency in [2, MaxShingleDf=100]; set
    // sizes stay full
    val df = docs.flatMap { case (id, sh) => sh.toSet.map((_: String) -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val kept = df.filter { case (_, d) => d >= 2 && d <= 100 }.keySet
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      inter = sa.toSet.intersect(sb.toSet).count(kept.contains)
      if inter > 0
      jac = inter.toDouble / (sa.toSet.size + sb.toSet.size - inter)
      if jac >= 0.5
    } { adj(a) += b; adj(b) += a }
    val nodes = adj.keySet.toSet
    var level = nodes.filter(_ % 29 == 0)
    var dist = level.map(_ -> 0L).toMap
    for (r <- 1 to 3) {
      val next = level.flatMap(adj).diff(dist.keySet)
      dist = dist ++ next.map(_ -> r.toLong)
      level = next
    }
    assert(pairs == dist,
      s"extra=${pairs.toSet -- dist.toSet} missing=${dist.toSet -- pairs.toSet}")
  }
}
