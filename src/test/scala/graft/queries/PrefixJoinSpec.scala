package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import graft.sources.Tables

/** q120 prefix-filtered similarity join: the lossless candidate-pruning
  * invariants that the DuckDB gate (exact uncapped Jaccard oracle) cannot
  * express on its own. */
class PrefixJoinSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, dir)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("q36's capped pairs are a subset of q120's lossless pairs") {
    // q36 generates candidates from df-capped posting lists, so it can
    // only MISS pairs relative to ground truth; q120's prefix filter is
    // lossless. Both verify exact Jaccard >= 0.5, hence q36 ⊆ q120.
    val capped = pairs("q36_dedup_jaccard")
    val lossless = pairs("q120_dedup_prefix_join")
    assert(capped.subsetOf(lossless),
      s"capped-but-not-lossless pairs: ${capped.diff(lossless)}")
    assert(lossless.nonEmpty)
  }

  test("prefix index is strictly smaller than the full posting index") {
    // the cost claim behind the operator: only ~(1-tau) of each doc's
    // shingles reach a posting list, so the candidate-generation join
    // indexes a strict subset of the exploded corpus
    val base = Tables.spread(spark, dir, "documents")
      .select(col("doc_id"),
        graft.plans.WordShingles(col("text"), 3, distinct = true).as("sh"))
      .filter(size(col("sh")) > 0)
    val ex = base.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("s"))
    val full = ex.count()
    val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val pre = ex.join(dfreq, "s")
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n"),
        array_sort(collect_list(struct(col("df"), col("s")))).as("srt"))
      .select(explode(slice(col("srt"), lit(1),
        (col("n") - ceil(col("n") * 0.5) + 1).cast("int"))).as("p"))
      .count()
    info(s"posting index entries: full=$full prefix=$pre " +
      f"(${pre.toDouble / full * 100}%.1f%%)")
    assert(pre < full)
    // tau=0.5 keeps floor(n/2)+1 per doc: strictly more than half only
    // for tiny docs, so the corpus-level ratio must be well under 70%
    assert(pre.toDouble / full < 0.7)
  }
}
