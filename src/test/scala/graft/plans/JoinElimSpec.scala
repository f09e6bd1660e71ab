package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The PK-FK join-elimination rule: under a declared integrity edge a
  * key-only dimension join must vanish from the optimized plan AND
  * return exactly what the real join returns; every correctness
  * boundary — a filtered dimension, a dimension column escaping the
  * join, an outer join, an undeclared edge — must leave the join in
  * place. Uses the test corpus's lineitem→part edge (q122-audited). */
class JoinElimSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def li() = spark.read.parquet(s"$dir/lineitem.parquet")
    .select(col("l_partkey"), col("l_quantity"))
  private def pt() = spark.read.parquet(s"$dir/part.parquet")

  private def declare(): Unit =
    JoinElim.declare(spark, s"$dir/lineitem.parquet", "l_partkey",
      s"$dir/part.parquet", "p_partkey")

  private def scans(df: org.apache.spark.sql.DataFrame): Set[String] =
    SummaryRewrite.scannedPaths(df)

  private def joined() =
    li().join(pt().select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"))
      .agg(sum(floor(col("l_quantity")).cast("long")).as("q"))

  override def afterAll(): Unit = {
    JoinElim.clear()
    super.afterAll()
  }

  test("declared key-only join is eliminated and answer-preserving") {
    JoinElim.clear()
    val before = joined().collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(scans(joined()).exists(_.endsWith("part.parquet")),
      "undeclared edge must keep the join")
    declare()
    val after = joined()
    assert(!scans(after).exists(_.endsWith("part.parquet")),
      "declared key-only join still scans the dimension")
    assert(after.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == before, "elimination changed the answer")
  }

  test("a filtered dimension blocks elimination") {
    declare()
    val df = li().join(
        pt().filter(col("p_size") > 20).select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey")).agg(count(lit(1)).as("n"))
    assert(scans(df).exists(_.endsWith("part.parquet")),
      "a filtered dim no longer matches every fact row")
  }

  test("a dimension column escaping the join blocks elimination") {
    declare()
    val df = li().join(pt().select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
    assert(scans(df).exists(_.endsWith("part.parquet")))
  }

  test("an outer join blocks elimination") {
    declare()
    val df = li().join(pt().select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_outer")
      .groupBy(col("p_partkey")).agg(count(lit(1)).as("n"))
    assert(scans(df).exists(_.endsWith("part.parquet")))
  }

  test("fact-side filters stay transparent to elimination") {
    declare()
    val df = li().filter(col("l_quantity") > 10)
      .join(pt().select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey")).agg(count(lit(1)).as("n"))
    assert(!scans(df).exists(_.endsWith("part.parquet")),
      "a fact-side filter cannot break integrity")
    JoinElim.clear()
    val plain = li().filter(col("l_quantity") > 10)
      .join(pt().select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    declare()
    assert(df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == plain)
  }
}
