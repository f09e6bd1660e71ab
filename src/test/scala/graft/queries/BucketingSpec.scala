package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Co-located joins via bucketing (the 100 TB shuffle-elimination play):
  * write both join sides bucketed by the join key, then verify the join
  * plan has no shuffle exchange and results match the plain join. */
class BucketingSpec extends SparkSpec {

  test("bucketed join runs without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.sources.Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = graft.sources.Tables(spark, dir, "orders")
      .select("o_orderkey", "o_custkey")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_b")

    // hint forces a sort-merge join (the tiny test tables would otherwise
    // auto-broadcast, which proves nothing about bucketing)
    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("ord_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("l_quantity")).as("q"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // both sides pre-bucketed on the join key -> SortMergeJoin with no
    // Exchange below it (only the final groupBy may shuffle)
    val joinSection = plan.split("SortMergeJoin")(1)
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      s"unexpected shuffle under the join:\n$plan")

    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => (r.get(0), r.get(1))).toMap
    val got = joined.collect().map(r => (r.get(0), r.get(1))).toMap
    assert(got == expected)

    spark.sql("DROP TABLE li_b")
    spark.sql("DROP TABLE ord_b")
  }
}
