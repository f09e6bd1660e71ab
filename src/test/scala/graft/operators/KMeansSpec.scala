package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential tests for [[KMeans]]: the distributed assignment must
  * equal a plain single-threaded Lloyd reference on the same quantized
  * input (both use exact integer arithmetic, so equality is exact — no
  * tolerance), stay invariant under input partitioning, and keep empty
  * clusters alive via centroid carry-forward. */
class KMeansSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val K = 8
  private val Iters = 3
  private val Dim = graft.functions.Vectors.Dim

  private def quantized = {
    import spark.implicits._
    graft.sources.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))")
        .as("qv"))
  }

  /** Single-threaded exact Lloyd, the operator's ground truth. */
  private def reference(vecs: Seq[(Long, Array[Long])], k: Int,
      iters: Int): Map[Long, (Int, Long)] = {
    def dist(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def argmin(q: Array[Long], cents: Array[Array[Long]]): (Int, Long) =
      cents.zipWithIndex
        .map { case (c, j) => (dist(q, c), j) }
        .min match { case (d, j) => (j, d) }
    var cents = vecs.sortBy(_._1).take(k).map(_._2.clone()).toArray
    for (_ <- 1 to iters) {
      val byCluster = vecs.groupBy { case (_, q) => argmin(q, cents)._1 }
      cents = cents.zipWithIndex.map { case (old, j) =>
        byCluster.get(j) match {
          case Some(members) =>
            val n = members.size
            Array.tabulate(old.length) { i =>
              members.map(_._2(i)).sum / n // Long division truncates: `div`
            }
          case None => old // carry-forward
        }
      }
    }
    vecs.map { case (id, q) => id -> argmin(q, cents) }.toMap
  }

  test("distributed assignment equals the single-threaded Lloyd reference") {
    val local = quantized.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .toSeq
    val expected = reference(local, K, Iters)
    val got = KMeans.assign(quantized, K, Iters, Dim).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got.size == local.size)
    assert(got == expected)
  }

  test("assignment is invariant to input partitioning") {
    val base = KMeans.assign(quantized, K, Iters, Dim)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val repart = KMeans.assign(quantized.repartition(7), K, Iters, Dim)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(base == repart)
  }

  test("groupedCentroids equals per-group centroids() bit-for-bit") {
    import spark.implicits._
    // 4 subspaces of 16 dims as 4 groups — the q146 training shape; the
    // grouped single-job trainer must reproduce the sequential
    // per-subspace trainer exactly (init rank, argmin ties, div)
    val m = 4; val sub = 16
    val grouped = quantized.select(
      posexplode(expr(s"transform(sequence(0, ${m - 1}), " +
        s"g -> slice(qv, g * $sub + 1, $sub))")).as(Seq("g", "sq")),
      col("vec_id"))
      .select(col("g"), col("vec_id").as("id"), col("sq").as("qv"))
    val got = KMeans.groupedCentroids(grouped, 8, 2, sub)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Long](2).toSeq)
      .toMap
    val want = (0 until m).flatMap { g =>
      KMeans.centroids(
        quantized.select(col("vec_id").as("id"),
          expr(s"slice(qv, ${g * sub + 1}, $sub)").as("qv")), 8, 2, sub)
        .collect()
        .map(r => (g, r.getInt(0)) -> r.getSeq[Long](1).toSeq)
    }.toMap
    assert(got == want, "grouped trainer diverged from the sequential one")
  }

  test("a cluster that captures no points keeps its previous centroid") {
    import spark.implicits._
    // v2 duplicates v0, so init centroid 2 == centroid 0 and every point
    // ties toward the lower cid: cluster 2 never captures a point and
    // must carry its centroid (a dropped row here would shrink k)
    val tiny = Seq(
      (0L, Array(0L)), (1L, Array(1000000L)), (2L, Array(0L)))
      .toDF("id", "qv")
    val got = KMeans.assign(tiny, 3, 2, 1).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got == Map(0L -> ((0, 0L)), 1L -> ((1, 0L)), 2L -> ((0, 0L))))
  }
}
