package graft.queries

import graft.SparkSpec

/** Error/determinism bounds for the non-oracle profiling operators
  * (q50 sketches, q51 sampling). */
class ProfilingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    Profiling.specs.find(_.name == name).get.run(spark, dir)

  test("q50 sketches: exact companions match, in-engine bounds all true") {
    val exact = graft.sources.Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.countDistinct("l_orderkey").as("d"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val rows = run("q50_approx_sketch").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d, n) = exact(r.getString(0))
      assert(r.getLong(1) == d, s"exact_orders ${r.getLong(1)} != $d")
      assert(r.getLong(2) == n, s"n ${r.getLong(2)} != $n")
      // the driver-visible sketch contract: every bound boolean TRUE
      assert(r.getBoolean(3), "hll_ok false")
      assert(r.getBoolean(4), "q50_ok false")
      assert(r.getBoolean(5), "q95_ok false")
    }
  }

  test("q51 stratified sample: seeded determinism and plausible rates") {
    val a = run("q51_sample_stratified").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = run("q51_sample_stratified").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b) // same seed -> identical sample
    val totals = graft.sources.Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = Map("A" -> 0.2, "N" -> 0.5, "R" -> 0.8)
    for ((k, frac) <- target) {
      val rate = a(k).toDouble / totals(k)
      assert(math.abs(rate - frac) < 0.08, s"stratum $k rate $rate != $frac")
    }
  }
}
