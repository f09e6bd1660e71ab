package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TopKScoreId primitive heap vs TopKAgg and the ranking-window form. */
class TopKScoreIdSpec extends SparkSpec {
  import spark.implicits._

  test("matches TopKAgg on random groups across partitions") {
    val rnd = new scala.util.Random(19)
    val rows = (1 to 5000).map { _ =>
      (rnd.nextInt(40), rnd.nextDouble(), rnd.nextInt(500).toLong)
    }
    // repartition: forces partial buffers through serialize + merge
    val df = rows.toDF("g", "v", "id").repartition(13)
    val fast = df.groupBy(col("g"))
      .agg(TopKScoreId(col("v"), -col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("g"), col("i"), (-col("t.id")).as("id"), col("t.score"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sorted
    val ref = df.groupBy(col("g"))
      .agg(TopKAgg(struct(col("v"), (-col("id")).as("nk")), 5).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("g"), col("i"), (-col("t.nk")).as("id"), col("t.v"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sorted
    assert(fast.sameElements(ref))
  }

  test("ties on score break by id descending (negate for ascending)") {
    val df = Seq((1, 1.0, 10L), (1, 1.0, 20L), (1, 1.0, 30L))
      .toDF("g", "v", "id")
    val got = df.groupBy(col("g"))
      .agg(TopKScoreId(col("v"), -col("id"), 2).as("top"))
      .select(posexplode(col("top")).as(Seq("i", "t")))
      .select((-col("t.id")).as("id"))
      .collect().map(_.getLong(0)).toSeq
    // largest (score, -id) pairs: ids 10 then 20
    assert(got == Seq(10L, 20L))
  }

  test("groups smaller than k emit all rows, sorted descending") {
    val df = Seq((1, 0.3, 1L), (1, 0.9, 2L)).toDF("g", "v", "id")
    val got = df.groupBy(col("g"))
      .agg(TopKScoreId(col("v"), col("id"), 5).as("top"))
      .select(posexplode(col("top")).as(Seq("i", "t")))
      .select(col("t.score")).collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(0.9, 0.3))
  }

  test("a NaN score cannot poison the heap root") {
    // NaN offered FIRST: under IEEE < it compares false both ways, so a
    // naive heap would keep it at the root and reject every later
    // offer once full. The total order ranks NaN greatest (Spark SQL's
    // double ordering), so the top-2 is (NaN, 0.9) — and the real
    // scores still flow through the heap.
    val df = Seq((1, Double.NaN, 1L), (1, 0.7, 2L), (1, 0.9, 3L),
      (1, 0.8, 4L)).toDF("g", "v", "id").coalesce(1)
    val got = df.groupBy(col("g"))
      .agg(TopKScoreId(col("v"), col("id"), 2).as("top"))
      .select(posexplode(col("top")).as(Seq("i", "t")))
      .select(col("t.id")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L))
  }
}
