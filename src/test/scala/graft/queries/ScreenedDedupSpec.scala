package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** q260 screen-then-lossless composition: the algebraic contract beyond
  * the DuckDB gate. The composition's definition is "q120's lossless
  * gate, confined to the screened suspect slice" — so its result must
  * be EXACTLY the full q120 pair set intersected with suspect² (the
  * PPJoin losslessness argument applies verbatim on the slice), never
  * a pair outside it, never one of the slice's true pairs missing.
  * Screen recall against the FULL corpus is q121's documented
  * trade-off, measured in SortedNeighborhoodSpec — here it shows up
  * only as the (expected, legitimate) full-minus-screened difference.
  */
class ScreenedDedupSpec extends SparkSpec {
  import spark.implicits._

  test("q260 = q120 ∩ suspect², at both gate SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      def pairs(name: String): Set[(Long, Long)] =
        SparkEntry.queries(name)(spark, dir)
          .select(col("a_id"), col("b_id"))
          .as[(Long, Long)].collect().toSet
      val full = pairs("q120_dedup_prefix_join")
      val comp = pairs("q260_screened_dedup")
      assert(comp.subsetOf(full),
        s"$dir: the composition emitted pairs the lossless gate never " +
          s"would: ${comp.diff(full)}")
      // suspects re-derived through the same screen the query runs
      val sus = Dedup.snmHammingPairs(spark, dir, 8)
        .select(explode(array(col("a_id"), col("b_id"))).as("d"))
        .as[Long].collect().toSet
      val expected = full.filter { case (a, b) => sus(a) && sus(b) }
      assert(comp == expected,
        s"$dir: composition != full ∩ suspect² (missing " +
          s"${expected.diff(comp).size}, extra ${comp.diff(expected).size})")
      assert(comp.nonEmpty, s"$dir: the screen found no near-dup pairs " +
        "at all — the composition gate would be vacuous")
      info(s"$dir: ${full.size} lossless pairs -> ${comp.size} screened " +
        s"(${sus.size} suspect docs)")
    }
  }
}
