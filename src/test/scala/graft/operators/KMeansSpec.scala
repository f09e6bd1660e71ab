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

  test("assignAuto: flat at or under the ceiling, two-level past it") {
    val key = KMeans.FlatKCeilingKey
    val flat = KMeans.assign(quantized, K, Iters, Dim)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    try {
      // k == ceiling: the selector must take the flat path bit-identically
      spark.conf.set(key, K.toString)
      val auto = KMeans.assignAuto(quantized, K, Iters, Dim)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(auto == flat, "assignAuto at the ceiling diverged from flat")
      // k > ceiling: the two-level path must be the one taken
      spark.conf.set(key, (K - 1).toString)
      val two = KMeans.assignAuto(quantized, K, Iters, Dim)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val direct = KMeans.assignTwoLevel(quantized, K, Iters, Dim)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(two == direct, "assignAuto past the ceiling is not two-level")
      assert(two != flat, "two-level unexpectedly equals flat on this corpus")
    } finally spark.conf.unset(key)
  }

  test("two-level assignment: per-cell argmin against that cell's codebook") {
    // reconstruct the two-level result from its own primitives: coarse
    // cells from centroids(k1), per-cell fine codebooks from
    // groupedCentroids, then assignUnder within each cell — the fused
    // operator must agree row for row (id -> (g*k2 + fine, fineDist))
    val k = 6 // k1 = 3, k2 = 2
    val k1 = math.ceil(math.sqrt(k.toDouble)).toInt
    val k2 = (k + k1 - 1) / k1
    val coarse = KMeans.centroids(quantized, k1, Iters, Dim)
    val asg1 = KMeans.assignUnder(quantized, coarse)
      .select(col("id"), col("qv"), col("cid").as("g"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getInt(2)))
    import spark.implicits._
    val fineIn = asg1.toSeq.map { case (id, qv, g) => (g, id, qv) }
      .toDF("g", "id", "qv")
    val fine = KMeans.groupedCentroids(fineIn, k2, Iters, Dim)
    val want = asg1.groupBy(_._3).toSeq.flatMap { case (g, members) =>
      val book = fine.filter(col("g") === g)
        .select(col("cid"), col("cv"))
      KMeans.assignUnder(
          members.toSeq.map(m => (m._1, m._2)).toDF("id", "qv"), book)
        .collect()
        .map(r => (r.getLong(0), g * k2 + r.getInt(2), r.getLong(3)))
        .toSeq
    }.toSet
    val got = KMeans.assignTwoLevel(quantized, k, Iters, Dim)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want, "fused two-level diverged from its primitives")
    assert(got.map(_._2).forall(c => c >= 0 && c < k1 * k2))
  }

  test("two-level assignment is invariant to input partitioning") {
    val base = KMeans.assignTwoLevel(quantized, 6, Iters, Dim)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val repart = KMeans.assignTwoLevel(quantized.repartition(7), 6, Iters, Dim)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(base == repart)
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
