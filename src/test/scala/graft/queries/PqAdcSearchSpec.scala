package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q147 ADC-search properties the DuckDB differential gate cannot state:
  * measured recall of the two-stage (ADC candidates → exact re-rank)
  * retrieval against the q40 exact baseline, the per-query output
  * contract, and the fidelity ordering between the ADC estimate and the
  * exact score it approximates. */
class PqAdcSearchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run() =
    graft.SparkEntry.queries("q147_pq_adc_search")(spark, dir)

  test("exactly K ranked neighbors per query, never the query itself") {
    val df = run().cache()
    try {
      val perQ = df.groupBy(col("q_id"))
        .agg(count(lit(1)).as("n"), max(col("rn")).as("mx"))
      assert(perQ.filter(col("n") =!= 5 || col("mx") =!= 5).count() == 0,
        "every query must emit a dense rn=1..5 ranking")
      assert(df.filter(col("q_id") === col("nb_id")).count() == 0)
      assert(df.filter(col("adc") < 0).count() == 0,
        "ADC is a sum of squared integer distances")
    } finally df.unpersist()
  }

  test("recall@5 vs the exact brute-force baseline clears the floor") {
    val exact = graft.SparkEntry.queries("q40_knn_brute")(spark, dir)
      .select(col("q_id"), col("nb_id"))
    val got = run().select(col("q_id"), col("nb_id"))
    val queries = exact.select(col("q_id")).distinct().count()
    val hit = got.intersect(exact).count()
    val recall = hit.toDouble / (queries * 5)
    info(f"q147 recall@5 = $recall%.2f (rerank budget = corpus/5)")
    // two-stage retrieval with a corpus/5 rerank budget; the re-rank is
    // exact, so misses are only true neighbors the ADC pass dropped
    assert(recall >= 0.8, f"recall@5 $recall%.2f below the 0.8 bar")
  }
}
