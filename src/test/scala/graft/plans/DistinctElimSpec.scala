package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The distinct-elimination rule: under a declared unique key a
  * `.distinct()` / `.dropDuplicates(key)` whose grouping covers the key
  * must lose its Aggregate AND return exactly what the real distinct
  * returns; every correctness boundary — key not in the grouping, an
  * undeclared table, a join below the distinct, a genuine aggregate —
  * must leave the Aggregate in place. Uses orders (o_orderkey is the
  * q52-audited primary key). */
class DistinctElimSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def orders() = spark.read.parquet(s"$dir/orders.parquet")

  private def declare(): Unit =
    DistinctElim.declare(spark, s"$dir/orders.parquet", "o_orderkey")

  private def nAggs(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.size

  override def afterAll(): Unit = {
    DistinctElim.clear()
    super.afterAll()
  }

  test("declared-key distinct is eliminated and answer-preserving") {
    DistinctElim.clear()
    val q = () => orders()
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      .distinct()
    val before = q().collect().toSet
    assert(nAggs(q()) == 1, "undeclared key must keep the aggregate")
    declare()
    assert(nAggs(q()) == 0, "declared-key distinct kept its aggregate")
    assert(q().collect().toSet == before, "elimination changed the answer")
  }

  test("dropDuplicates(key) with carried columns is eliminated") {
    declare()
    val q = () => orders()
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .dropDuplicates("o_orderkey")
    DistinctElim.clear()
    val before = q().collect().toSet
    assert(nAggs(q()) == 1)
    declare()
    assert(nAggs(q()) == 0,
      "dropDuplicates over the unique key kept its aggregate")
    assert(q().collect().toSet == before)
  }

  test("a distinct not covering the key keeps its aggregate") {
    declare()
    val df = orders()
      .select(col("o_custkey"), col("o_orderstatus")).distinct()
    assert(nAggs(df) == 1,
      "distinct without the unique key must not be eliminated")
  }

  test("an undeclared table keeps its aggregate") {
    declare()
    val df = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_name")).distinct()
    assert(nAggs(df) == 1)
  }

  test("a join below the distinct blocks elimination") {
    declare()
    val cu = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"))
    // the join can multiply rows as far as the walk knows — decline
    val df = orders().join(cu, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey")).distinct()
    assert(nAggs(df) == 1, "a join below the distinct must block")
  }

  test("a filter below the distinct stays eliminable") {
    declare()
    val q = () => orders()
      .filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_custkey")).distinct()
    assert(nAggs(q()) == 0,
      "filters only shrink a duplicate-free set — must still eliminate")
    DistinctElim.clear()
    val real = q().collect().toSet
    declare()
    assert(q().collect().toSet == real)
  }

  test("a genuine aggregate is never touched") {
    declare()
    val df = orders().groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n"))
    assert(nAggs(df) == 1, "count() is not a distinct — must stay")
    assert(df.collect().forall(_.getLong(1) == 1L))
  }
}
