package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Operator-level checks for [[LabelPropagation]]: the structural
  * containment relation vs ConnectedComponents (labels propagate only
  * along edges, so every node's community label must be a member of its
  * own component), plus the bridge-splitting behavior that motivates
  * LPA over CC, on a graph built to show it. */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  test("community labels stay inside the node's connected component") {
    // two cliques joined by one bridge edge + an isolated pair
    val edges = (for {
      a <- 0 to 4; b <- (a + 1) to 4
    } yield (a.toLong, b.toLong)) ++
      (for { a <- 10 to 14; b <- (a + 1) to 14 } yield (a.toLong, b.toLong)) ++
      Seq((4L, 10L), (20L, 21L))
    val df = edges.toDF("u", "v")
    val lpa = LabelPropagation.run(df, 3)
      .select(col("node"), col("community"))
    val cc = ConnectedComponents.run(df)
      .select(col("node").as("n"), col("cluster_id"))
    val joined = lpa
      .join(cc, lpa("node") === cc("n"))
      .select(col("node"), col("community"), col("cluster_id").as("node_cc"))
      .join(cc.select(col("n"), col("cluster_id").as("label_cc")),
        col("community") === col("n"))
    assert(joined.filter(col("node_cc") =!= col("label_cc")).isEmpty,
      "a community label escaped its connected component")
  }

  test("dense cliques keep distinct communities across a sparse bridge") {
    // CC merges the two 5-cliques through the single bridge edge; LPA's
    // frequency rule must not - each clique's mode label is internal.
    val edges = (for {
      a <- 0 to 4; b <- (a + 1) to 4
    } yield (a.toLong, b.toLong)) ++
      (for { a <- 10 to 14; b <- (a + 1) to 14 } yield (a.toLong, b.toLong)) ++
      Seq((4L, 10L))
    val df = edges.toDF("u", "v")
    val communities = LabelPropagation.run(df, 3)
      .select(col("node"), col("community"))
      .as[(Long, Long)].collect().toMap
    val left = (0L to 4L).map(communities)
    val right = (10L to 14L).map(communities)
    assert(left.toSet.intersect(right.toSet).isEmpty,
      s"bridge merged the cliques: left=$left right=$right")
    val ccClusters = ConnectedComponents.run(df)
      .select(col("cluster_id")).distinct().count()
    assert(ccClusters == 1, "CC should see one component (the contrast)")
  }
}
