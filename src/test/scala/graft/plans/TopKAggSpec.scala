package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bounded-heap top-k aggregate vs a brute-force model: random data,
  * random partitionings (exercising serialize/merge), ties, and groups
  * smaller than k. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(99)

  test("matches brute-force top-k under random partitioning, with ties") {
    val rows = (1 to 400).map(i =>
      (rnd.nextInt(9), rnd.nextInt(20).toDouble, i.toLong)) // many ties in v
    val expect = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(t => (t._2, -t._3))
        .sorted(Ordering[(Double, Long)].reverse).take(5)
        .map { case (v, nk) => (v, -nk) }
    }
    for (parts <- Seq(1, 4, 16)) {
      val got = rows.toDF("g", "v", "id")
        .repartition(parts)
        .groupBy(col("g"))
        .agg(TopKAgg(struct(col("v"), (-col("id")).as("nk")), 5).as("top"))
        .select(col("g"), col("top"))
        .collect()
        .map(r => r.getInt(0) ->
          r.getSeq[org.apache.spark.sql.Row](1)
            .map(t => (t.getDouble(0), -t.getLong(1))))
        .toMap
      assert(got.view.mapValues(_.toList).toMap ==
        expect.view.mapValues(_.toList).toMap, s"parts=$parts")
    }
  }

  test("groups smaller than k return the whole group, sorted") {
    val got = Seq((1, 3.0), (1, 1.0), (2, 5.0))
      .toDF("g", "v")
      .groupBy(col("g"))
      .agg(TopKAgg(struct(col("v")), 10).as("top"))
      .collect()
      .map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(0)).toList)
      .toMap
    assert(got == Map(1 -> List(3.0, 1.0), 2 -> List(5.0)))
  }
}
