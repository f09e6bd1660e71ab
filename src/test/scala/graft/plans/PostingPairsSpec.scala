package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PostingPairs generator vs the nested-array SQL expansion. */
class PostingPairsSpec extends SparkSpec {
  import spark.implicits._

  test("emits exactly the ordered pairs of each list") {
    val df = Seq(
      (1, Seq(10L, 20L, 30L)),
      (2, Seq(7L, 9L)),
      (3, Seq(42L)),       // too short: no pairs
      (4, Seq.empty[Long])
    ).toDF("g", "ds")
    val got = df.select(col("g"), PostingPairs(col("ds")).as(Seq("a", "b")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1, 10L, 20L), (1, 10L, 30L), (1, 20L, 30L), (2, 7L, 9L)))
  }

  test("matches the SQL nested expansion on random sorted lists") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 50).map(i =>
      (i, (0 until rnd.nextInt(12)).map(_ => rnd.nextInt(1000).toLong)
        .distinct.sorted))
    // size >= 2 like every production call site: the SQL reference's
    // sequence(0, size-2) runs DESCENDING for shorter lists and indexes
    // out of bounds (the generator handles them by emitting nothing)
    val df = rows.toDF("g", "ds").filter(size(col("ds")) >= 2)
    val sqlPairs = df.select(col("g"), explode(expr(
        """flatten(transform(sequence(0, size(ds)-2), i ->
          |  transform(sequence(i+1, size(ds)-1),
          |    j -> struct(ds[i] AS a, ds[j] AS b))))""".stripMargin)).as("p"))
      .select(col("g"), col("p.a"), col("p.b"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    val gen = df.select(col("g"), PostingPairs(col("ds")).as(Seq("a", "b")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    assert(gen.sameElements(sqlPairs))
  }
}
