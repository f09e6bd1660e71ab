package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Recall of the approximate ANN paths against exact brute force — the
  * quality metric that justifies calling q41/q42 the 100 TB paths. Each
  * query returns (q_id, nb_id, rn, cos) top-k rows; recall@k = |approx ∩
  * exact| / |exact| per query id, averaged. SRP-LSH (q41) and IVF (q42)
  * probe only their own buckets, so recall < 1 is expected; what must
  * hold is that the buckets capture MOST true neighbors (the parameters
  * are tuned for that at this dimensionality). A threshold spec rather
  * than exact parity: the oracle hash-check already pins each query's
  * own determinism. */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private def topkDf(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("q_id", "nb_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }

  private def topk(q: String): Map[Long, Set[Long]] =
    topkDf(SparkEntry.queries(q)(spark, dir))

  test("LSH and IVF recall@k vs brute force stays high at sf0.01") {
    val exact = topk("q40_knn_brute")
    // floors sit just under the measured operating points (Similarity's
    // header comment / SURVEY §8 curve): q41 L=12 b=4 measures 0.84,
    // q102 nprobe=5 measures 0.86 — both pinned at the 0.8 production
    // bar. q42's fixed label partition is a semantic, untrained
    // quantizer with a MEASURED recall ceiling (0.92 even at a 0.8
    // corpus fraction); its knee nprobe=5 measures 0.72, pinned at 0.7,
    // and the >=0.8 path at sublinear cost is the learned q102.
    // q147 (full-corpus ADC + rerank) measures 0.90 here / 0.84 at
    // sf0.1, pinned 0.8; the retired-to-spec inline IVFADC build
    // (Similarity.ivfPqInlineSearch, ex-q148) measures 0.74 / 0.81
    // under q102's 0.86 within-lists ceiling, pinned 0.7 like q42.
    // q163 (SQ8 flat: 8 bits/dim, full-corpus proxy scan + rerank)
    // measures 1.00 at BOTH sf0.01 and sf0.1 — scalar quantization at
    // a byte per dimension is nearly lossless at d=64, which is why
    // vector stores ship it as the accuracy floor; pinned 0.95.
    // q167 (IVF-SQ) measures 0.86 — EQUAL to q102's exact-within-lists
    // ceiling: the byte codes + rerank lose nothing past the coarse
    // routing; pinned 0.8 like q102.
    val paths: Seq[(String, () => Map[Long, Set[Long]], Double)] = Seq(
      ("q41_knn_lsh", () => topk("q41_knn_lsh"), 0.8),
      ("q42_knn_ivf", () => topk("q42_knn_ivf"), 0.7),
      ("q102_ivf_learned", () => topk("q102_ivf_learned"), 0.8),
      ("q147_pq_adc_search", () => topk("q147_pq_adc_search"), 0.8),
      // the inline IVFADC build left the query ledger in round 13
      // (q187 carries the slot) but keeps its recall floor here
      ("ivfPqInlineSearch (ex-q148)",
        () => topkDf(Similarity.ivfPqInlineSearch(spark, dir)), 0.7),
      ("q163_sq8_search", () => topk("q163_sq8_search"), 0.95),
      ("q167_ivf_sq_search", () => topk("q167_ivf_sq_search"), 0.8))
    for ((name, run, floor) <- paths) {
      // q187 serves the inline build's EXACT result set from the
      // persisted index (shared oracle, hash-gated), so its recall is
      // the inline path's by construction — pinned below by the
      // result-parity test instead.
      val approx = run()
      val recalls = exact.map { case (q, nbs) =>
        approx.getOrElse(q, Set.empty).intersect(nbs).size.toDouble / nbs.size
      }
      val mean = recalls.sum / recalls.size
      info(f"$name mean recall@k = $mean%.3f over ${recalls.size} queries")
      assert(mean >= floor,
        f"$name mean recall@k $mean%.3f fell below $floor")
    }
  }

  test("multi-probe dominates single-probe LSH at the same index") {
    // q229 probes q41's index plus every one-bit-flip bucket: its
    // candidate set is a SUPERSET of q41's by construction, so per-query
    // recall can only rise — pinned as mean recall@k(q229) >= q41's,
    // plus a strict global-improvement check (if flipping 48 probe bits
    // recovered NOTHING on this corpus the knob would be dead weight)
    val exact = topk("q40_knn_brute")
    def mean(m: Map[Long, Set[Long]]) = {
      val rs = exact.map { case (q, nbs) =>
        m.getOrElse(q, Set.empty).intersect(nbs).size.toDouble / nbs.size }
      rs.sum / rs.size
    }
    val single = mean(topk("q41_knn_lsh"))
    val multi = mean(topk("q229_knn_multiprobe"))
    info(f"recall@k single-probe $single%.3f -> multi-probe $multi%.3f")
    assert(multi >= single,
      f"multi-probe recall $multi%.3f fell below single-probe $single%.3f")
    assert(multi > single,
      "multi-probe recovered no additional true neighbors at sf0.01")
  }

  test("q187 persisted-index serve returns exactly the inline build's result set") {
    // the round-13 ledger swap's cross-pin (ex-q148 → q187): build+serve
    // and index-serve share every numeric stage (the same
    // ivfPqCentroids/pqCodebooks/pqEncoded helpers feed ivfPqServe), so
    // the top-k must match ROW FOR ROW — any drift means the persisted
    // tables no longer carry the trained index bit-exactly
    val inline = Similarity.ivfPqInlineSearch(spark, dir)
      .select("q_id", "nb_id", "rn").as[(Long, Long, Int)].collect().toSet
    val served = SparkEntry.queries("q187_ivfpq_serve")(spark, dir)
      .select("q_id", "nb_id", "rn").as[(Long, Long, Int)].collect().toSet
    assert(inline == served,
      s"index-served top-k drifted from inline build+serve: " +
        s"${(inline diff served).size} missing, ${(served diff inline).size} extra")
    info(s"inline-build/q187 parity over ${inline.size} result rows")
  }

  test("q188 persisted-index serve returns exactly q167's result set") {
    val inline = SparkEntry.queries("q167_ivf_sq_search")(spark, dir)
      .select("q_id", "nb_id", "rn").as[(Long, Long, Int)].collect().toSet
    val served = SparkEntry.queries("q188_ivf_sq_serve")(spark, dir)
      .select("q_id", "nb_id", "rn").as[(Long, Long, Int)].collect().toSet
    assert(inline == served,
      s"SQ index-served top-k drifted from inline build+serve: " +
        s"${(inline diff served).size} missing, ${(served diff inline).size} extra")
    info(s"q167/q188 parity over ${inline.size} result rows")
  }

  test("semdedup verdicts agree with the exact all-pairs baseline (q39)") {
    import org.apache.spark.sql.functions.col
    // every q39 pair captured by a cluster must reappear as a q103 drop;
    // and no q103 drop may lack SOME exact pair justifying it (a cluster
    // can only MISS cross-cluster pairs, never invent similarity)
    val exactPairs = SparkEntry.queries("q39_dedup_embed_cosine")(spark, dir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val sem = SparkEntry.queries("q103_semdedup")(spark, dir)
      .select("vec_id", "cluster", "keep")
      .as[(Long, Int, Boolean)].collect()
    val dropped = sem.filter(!_._3).map(_._1).toSet
    val cluster = sem.map(r => r._1 -> r._2).toMap
    val exactDropped = exactPairs.collect {
      case (a, b) if cluster(a) == cluster(b) => b
    }
    assert(exactDropped == dropped,
      s"same-cluster exact drops ${exactDropped.size} != semdedup drops ${dropped.size}")
    // the dropped higher-ids are a subset of the exact baseline's
    assert(dropped.subsetOf(exactPairs.map(_._2)),
      "semdedup dropped a vector with no exact near-dup pair at all")
    info(s"semdedup dropped ${dropped.size}/${sem.length}; " +
      s"exact baseline pairs ${exactPairs.size}")
  }
}
