package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** q121 sorted-neighborhood blocking: invariants beyond the DuckDB gate. */
class SortedNeighborhoodSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, dir)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("q121 pairs are a subset of q38's lossless hamming<=2 pairs") {
    // q38's 4x16-bit block join is lossless for hamming <= 3 (pigeonhole:
    // <= 3 flipped bits cannot touch all 4 blocks), so it contains every
    // hamming<=2 pair; q121's window candidates can only be a subset.
    val snm = pairs("q121_dedup_sorted_neighborhood")
    val lsh = pairs("q38_dedup_simhash")
    assert(snm.subsetOf(lsh),
      s"SNM emitted pairs outside ground truth: ${snm.diff(lsh)}")
    assert(snm.nonEmpty, "window w=8 found no pairs at sf0.001 — " +
      "either the corpus changed or the sort order broke")
    info(s"window coverage: ${snm.size}/${lsh.size} of exact hamming<=2 pairs")
  }
}
