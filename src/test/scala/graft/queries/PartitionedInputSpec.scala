package graft.queries

import org.apache.spark.sql.functions.col

import graft.{SparkEntry, SparkSpec}

/** Partition-invariance: a query's ANSWER must not depend on how the
  * input corpus happens to be split into files. The oracle sweep runs on
  * single-file tables; a 100 TB corpus arrives as thousands of files —
  * any query whose result drifts between the two layouts (accumulation
  * order, spark_partition_id leakage, per-partition sampling) is wrong
  * at scale even though CORRECTNESS_rN can't see it.
  *
  * Runs the layout-sensitive queries — global ordinals, hash sampling,
  * sequence packing, MinHash banding, connected components, exact
  * decimal moments — at sf0.001 against the canonical dir and a 5-way
  * repartitioned copy, asserting identical results. (A full 95-query
  * partitioned sweep at sf0.01 is a per-round side-run; this spec is the
  * fast always-on subset.)
  */
class PartitionedInputSpec extends SparkSpec {

  private val orig = "/root/testdata/sf0.001"
  private lazy val part: String = {
    val dst = java.nio.file.Files.createTempDirectory("graft_part").toString
    // Raw copy (nanosAsLong set first so a NANOS-written events.ts
    // survives as plain int64; a MICROS-written one passes through as
    // TIMESTAMP_NTZ — Tables normalizes every layout to TimestampType).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.sources.Tables.all.foreach { t =>
      spark.read.parquet(s"$orig/$t.parquet")
        .repartition(5)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    dst
  }

  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[Seq[String]] =
    rows.toSeq.map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("\u0000"))

  for (q <- Seq("q35_dedup_exact", "q37_dedup_minhash", "q51_sample_stratified",
      "q56_train_test_split", "q65_dup_clusters", "q71_sequence_packing",
      "q73_global_index", "q78_sample_fixed_k", "q88_exact_corr",
      "q92_epoch_shuffle", "q98_kmeans",
      // round-5 third pass: cluster-keyed pair joins (semdedup), the
      // iterative rank recurrence, the composed funnel, and the double
      // BM25 scores - each a distinct layout-sensitivity class
      "q103_semdedup", "q105_pagerank", "q111_pipeline_funnel",
      "q112_bm25",
      // round-6: the rank/scan operators (GlobalIndex ordinals under
      // fingerprint sort, PrefixSum cumulative axes, ntile arithmetic)
      // and the xor-checksum protocol - each depends on a global order
      // or order-independence claim the layout must not break
      "q121_dedup_sorted_neighborhood", "q123_pps_sample",
      "q124_table_diff", "q125_token_shards", "q127_equidepth_bins",
      "q129_label_propagation",
      // round-6 ninth wave onward: the iterative argmax chain (BPE's
      // per-round winner must not depend on partial-agg merge order),
      // frontier iteration (BFS), keyed-window chains (SCD2, trailing
      // frames), and the union+window as-of rewrite (attribution)
      "q130_bpe_merges", "q133_scd2_history", "q134_bfs_radius",
      "q135_rolling_features", "q138_attribution",
      // the third PrefixSum consumer: crossing-row selection depends on
      // the stamped global cumulative being layout-independent
      "q143_weighted_median")) {
    test(s"$q is invariant to input file layout") {
      val fn = SparkEntry.queries(q)
      val a = canon(fn(spark, orig).collect())
      val b = canon(fn(spark, part).collect())
      assert(a == b, s"$q drifted between single-file and 5-way layouts")
    }
  }
}
