package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** q186's MMR greedy against an independent in-memory reference (the
  * WaterfillSpec pattern): quantize, score, pool, and replay the
  * λ = 1/2 recurrence — at each step pick the pool candidate maximizing
  * rel − max-sim-to-selected, ties to the smaller id — with plain Scala
  * Longs, then demand row-for-row equality with the distributed fold.
  * Two claims ride on exactness: every micro-unit product ≤ 1e12 and
  * every 64-term sum ≤ 6.4e13 < 2^53, so the codegen'd float/double
  * DotProduct path IS the integer fold (the q163 doctrine); and the
  * (value desc, cid asc) window tie-break is deterministic. A crafted
  * duplicate-vector corpus pins the tie-break and the diversity branch
  * on data where ties are GUARANTEED, not incidental. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  /** Independent greedy reference over raw float embeddings — its own
    * quantization, scoring, and recurrence; shares no code with q186. */
  private def reference(vecs: Seq[(Long, Seq[Float])])
      : Set[(Long, Int, Long, Long)] = {
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1000000 + 0.5).toLong)
    }.toMap
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val out = Set.newBuilder[(Long, Int, Long, Long)]
    for (qid <- q.keys.toSeq.sorted if qid % 50 == 0) {
      val pool = q.toSeq.collect { case (cid, cv) if cid != qid =>
        (cid, dot(q(qid), cv), cv)
      }.sortBy { case (cid, rel, _) => (-rel, cid) }.take(Similarity.MmrPool)
      var selected = List.empty[(Long, Seq[Long])]
      for (step <- 1 to Similarity.MmrK) {
        val cands = pool.filterNot { case (cid, _, _) =>
          selected.exists(_._1 == cid)
        }
        val pick =
          if (step == 1) cands.minBy { case (cid, rel, _) => (-rel, cid) }
          else cands.minBy { case (cid, rel, cv) =>
            val ms = selected.map(s => dot(cv, s._2)).max
            (-(rel - ms), cid)
          }
        selected ::= (pick._1, pick._3)
        out += ((qid, step, pick._1, pick._2))
      }
    }
    out.result()
  }

  private def run(dir: String): Set[(Long, Int, Long, Long)] =
    SparkEntry.queries("q186_mmr_rerank")(spark, dir)
      .select(col("q_id"), col("step"), col("cid"), col("rel"))
      .as[(Long, Int, Long, Long)].collect().toSet

  test("distributed MMR == in-memory greedy on the real corpus") {
    val dir = "/root/testdata/sf0.01"
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val want = reference(vecs)
    val got = run(dir)
    assert(want.nonEmpty && got == want,
      s"${(want diff got).size} reference rows missing, " +
        s"${(got diff want).size} extra")
    info(s"parity over ${got.size} (query, step) selections")
  }

  test("crafted duplicates: ties break to the smaller id, twins deferred") {
    // base direction e0 plus distinct tails; cids 1 and 2 are EXACT
    // twins (guaranteed rel tie at step 1 and sim == |c|² once either
    // is selected), cid 3 is near-orthogonal to them
    val dim = 64
    def vec(parts: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(dim)(0.0f)
      parts.foreach { case (i, x) => a(i) = x }
      a.toSeq
    }
    val rows = Seq[(Long, Seq[Float])](
      0L -> vec(0 -> 1.0f),                  // the query (0 % 50 == 0)
      1L -> vec(0 -> 0.9f, 1 -> 0.3f),       // twin A
      2L -> vec(0 -> 0.9f, 1 -> 0.3f),       // twin B == twin A
      // (tail 0.3 keeps the twins' mutual sim 0.90 ABOVE their rel
      // margin over cid 3: 0.9−0.90 < 0.8−0.72, so deferral is strict —
      // a 0.1 tail lands 0.9−0.82 == 0.8−0.72, an exact tie)
      3L -> vec(0 -> 0.8f, 2 -> 0.5f),       // relevant, diverse
      4L -> vec(0 -> 0.7f, 3 -> 0.6f),
      5L -> vec(0 -> 0.6f, 4 -> 0.7f),
      6L -> vec(0 -> 0.5f, 5 -> 0.8f),
      7L -> vec(1 -> 0.2f))                  // near-irrelevant
    val dir = java.nio.file.Files.createTempDirectory("graft_mmr").toString
    rows.toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = run(dir)
    val want = reference(rows)
    assert(got == want)
    val order = got.toSeq.sortBy(_._2).map(_._3)
    // step 1: the rel tie between twins 1 and 2 breaks to cid 1; the
    // twin's huge mutual sim then defers cid 2 behind the diverse picks
    assert(order.head == 1L, s"tie did not break to smaller id: $order")
    assert(order.indexOf(2L) > order.indexOf(3L),
      s"duplicate twin was not deferred past the diverse candidate: $order")
  }
}
