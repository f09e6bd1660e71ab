package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q146 PQ-encode invariants the DuckDB differential gate cannot state:
  * code ranges, error non-negativity, and rerun determinism of the
  * sampled-training pipeline. */
class PqEncodeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run() =
    graft.SparkEntry.queries("q146_pq_encode")(spark, dir)

  test("codes are valid codebook ids and qerr is a non-negative integer") {
    val df = run().cache()
    try {
      val n = df.count()
      assert(n > 0)
      // every code in [0, ks); every vector encoded exactly once
      val codeCols = (0 until 8).map(m => col(s"c$m"))
      val bad = df.filter(codeCols.map(c => c < 0 || c >= 16).reduce(_ || _))
        .count()
      assert(bad == 0, "code outside [0, 16)")
      assert(df.filter(col("qerr") < 0).count() == 0)
      assert(df.select(col("vec_id")).distinct().count() == n)
    } finally df.unpersist()
  }

  test("sampled training is deterministic across reruns") {
    val a = run().collect().map(_.toSeq).toSeq
    val b = run().collect().map(_.toSeq).toSeq
    assert(a == b, "PQ pipeline must be rerun-deterministic")
  }
}
