package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SortedIntersectCount merge vs size(array_intersect) on sorted
  * string sets — the q120 verify-stage contract. */
class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  test("equals size(array_intersect) on random sorted string sets") {
    val rnd = new scala.util.Random(7)
    def set(): Seq[String] =
      (0 until rnd.nextInt(30)).map(_ => s"tok${rnd.nextInt(40)}")
        .distinct.sorted
    val rows = (1 to 200).map(i => (i, set(), set()))
    val df = rows.toDF("i", "a", "b")
    val diff = df.select(
        SortedIntersectCount(col("a"), col("b")).as("m"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("m") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("empty and disjoint inputs") {
    val df = Seq(
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a"), Seq.empty[String]),
      (Seq("a", "b"), Seq("c", "d"))
    ).toDF("a", "b")
    val got = df.select(SortedIntersectCount(col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 0, 0))
  }
}
