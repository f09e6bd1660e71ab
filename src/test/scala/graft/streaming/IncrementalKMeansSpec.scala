package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential tests for [[IncrementalKMeans]]: the distributed
  * per-batch step must equal a single-threaded implementation of the
  * same mini-batch recurrence exactly (all-integer, no tolerance), be
  * partition-invariant within a batch, and run unchanged under a real
  * foreachBatch stream. */
class IncrementalKMeansSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val K = 8
  private val Dim = graft.functions.Vectors.Dim

  private def quantized: Seq[(Long, Seq[Long])] =
    graft.sources.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))")
        .as("qv"))
      .as[(Long, Seq[Long])].collect().toSeq.sortBy(_._1)

  private def dist(a: Seq[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < Dim) { val t = a(i) - b(i); s += t * t; i += 1 }
    s
  }

  /** Single-threaded twin of the operator's exact recurrence. */
  private def reference(batches: Seq[Seq[(Long, Seq[Long])]])
      : (Array[Array[Long]], Array[Long]) = {
    var cv: Array[Array[Long]] = null
    var n: Array[Long] = null
    for (b <- batches) {
      if (cv == null) {
        cv = b.sortBy(_._1).take(K).map(_._2.toArray).toArray
        n = Array.fill(K)(0L)
      }
      val byCluster = b.groupBy { case (_, q) =>
        cv.indices.minBy(j => (dist(q, cv(j)), j))
      }
      for ((j, pts) <- byCluster) {
        val bn = pts.size.toLong
        n(j) += bn
        var i = 0
        while (i < Dim) {
          val s = pts.map(_._2(i)).sum
          cv(j)(i) += (s - bn * cv(j)(i)) / n(j)
          i += 1
        }
      }
    }
    (cv, n)
  }

  private def batches5 = quantized.grouped(100).toSeq // 5 ordered batches

  test("mini-batch recurrence equals the single-threaded reference") {
    val ikm = new IncrementalKMeans(K, Dim)
    batches5.foreach(b => ikm.update(b.toDF("id", "qv")))
    val (wantCv, wantN) = reference(batches5)
    val got = ikm.centroids
    assert(got.size === K)
    got.foreach { case (j, c, nj) =>
      assert(c == wantCv(j).toSeq, s"centroid $j diverged")
      assert(nj === wantN(j), s"count $j diverged")
    }
    // and the final assignment agrees with the reference argmin
    val asg = ikm.assign(quantized.toDF("id", "qv"))
      .as[(Long, Int, Long)].collect()
      .map { case (id, c, _) => id -> c }.toMap
    quantized.foreach { case (id, q) =>
      val want = wantCv.indices.minBy(j => (dist(q, wantCv(j)), j))
      assert(asg(id) === want, s"assignment of $id diverged")
    }
  }

  test("the per-batch step is partition-invariant") {
    val one = new IncrementalKMeans(K, Dim)
    val many = new IncrementalKMeans(K, Dim)
    batches5.foreach { b =>
      one.update(b.toDF("id", "qv").coalesce(1))
      many.update(b.toDF("id", "qv").repartition(7))
    }
    assert(one.centroids === many.centroids)
  }

  test("runs unchanged under foreachBatch on a real stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Long])]
    val ikm = new IncrementalKMeans(K, Dim)
    val q = in.toDS().toDF("id", "qv").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) ikm.update(batch)
      }
      .start()
    try {
      batches5.take(2).foreach { b =>
        in.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val (wantCv, wantN) = reference(batches5.take(2))
    ikm.centroids.foreach { case (j, c, nj) =>
      assert(c == wantCv(j).toSeq && nj === wantN(j),
        s"streaming state $j diverged from the 2-batch reference")
    }
  }
}
