package graft.queries

import graft.SparkSpec

/** Error/determinism bounds for the non-oracle profiling operators
  * (q50 sketches, q51 sampling). */
class ProfilingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    Profiling.specs.find(_.name == name).get.run(spark, dir)

  test("q50 sketches: HLL distinct within 5%, quantiles within bounds") {
    val exact = graft.sources.Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.countDistinct("l_orderkey").as("d"),
        org.apache.spark.sql.functions.min("l_extendedprice").as("lo"),
        org.apache.spark.sql.functions.max("l_extendedprice").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    run("q50_approx_sketch").collect().foreach { r =>
      val (d, lo, hi) = exact(r.getString(0))
      val approx = r.getLong(1)
      assert(math.abs(approx - d).toDouble / d <= 0.05,
        s"HLL off by >5%: $approx vs $d")
      val qs = Seq(r.getDouble(2), r.getDouble(3)) // price_q50, price_q95
      assert(qs.forall(q => q >= lo && q <= hi))
      assert(qs(0) <= qs(1)) // median <= p95
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
