package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native NearestCentroid expression: randomized parity with the
  * interpreted HOF argmin it replaced, foldable-literal vs column-fed
  * table agreement, the lowest-cid tiebreak the early exit must not
  * break, the truncation convention, and the fail-loud empty-table
  * contract. */
class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  /** The exact HOF form KMeans.assignUnder used before the native node
    * — kept here as the differential oracle. */
  private val hofBest =
    """array_min(transform(cents, c -> struct(
      |  aggregate(zip_with(qv, c.cv, (x, y) -> (x - y) * (x - y)),
      |    0L, (acc, d) -> acc + d) AS d,
      |  c.cid AS cid)))""".stripMargin

  private val rnd = new scala.util.Random(7)
  private def vec(dim: Int): Seq[Long] =
    Seq.fill(dim)((rnd.nextInt(6000001) - 3000000).toLong)

  test("randomized parity with the interpreted HOF argmin (column path)") {
    val dim = 16
    val cents = (0 until 40).map(c => (c, vec(dim)))
    val rows = (1 to 300).map(i => (i.toLong, vec(dim)))
    val df = rows.toDF("id", "qv")
      .withColumn("cents", typedlit(cents)
        .cast("array<struct<cid: int, cv: array<bigint>>>"))
    val native = df
      .select(col("id"), NearestCentroid(col("qv"), col("cents")).as("b"))
      .select(col("id"), col("b.d"), col("b.cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val hof = df
      .select(col("id"), expr(hofBest).as("b"))
      .select(col("id"), col("b.d"), col("b.cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(native == hof)
  }

  test("foldable literal path equals the column path") {
    val dim = 8
    val cents = (0 until 17).map(c => (c, vec(dim)))
    val rows = (1 to 100).map(i => (i.toLong, vec(dim)))
    val lit = typedlit(cents)
    val viaLit = rows.toDF("id", "qv")
      .select(col("id"), NearestCentroid(col("qv"), lit).as("b"))
      .select(col("id"), col("b.d"), col("b.cid"))
      .collect().map(_.toSeq).toSeq
    val viaCol = rows.toDF("id", "qv").withColumn("cents", lit)
      .select(col("id"), NearestCentroid(col("qv"), col("cents")).as("b"))
      .select(col("id"), col("b.d"), col("b.cid"))
      .collect().map(_.toSeq).toSeq
    assert(viaLit == viaCol)
  }

  test("exact-distance tie goes to the lowest cid despite the early exit") {
    // two identical centroids under different cids, listed high-cid
    // first: a `>=` early exit would abandon the second (lower-cid)
    // centroid at its final element and return 9
    val cents = typedlit(Seq((9, Seq(1L, 2L)), (3, Seq(1L, 2L)),
      (5, Seq(100L, 100L))))
    val got = Seq((1L, Seq(0L, 0L))).toDF("id", "qv")
      .select(NearestCentroid(col("qv"), cents).as("b"))
      .select(col("b.d"), col("b.cid")).head
    assert(got.getLong(0) == 5L && got.getInt(1) == 3)
  }

  test("length mismatch truncates to the common prefix") {
    val cents = typedlit(Seq((0, Seq(1L, 1L, 1L, 999999L))))
    val got = Seq((1L, Seq(2L, 2L, 2L))).toDF("id", "qv")
      .select(NearestCentroid(col("qv"), cents).as("b"))
      .select(col("b.d")).head.getLong(0)
    assert(got == 3L)
  }

  test("empty centroid table fails loudly") {
    val err = intercept[Exception] {
      Seq((1L, Seq(1L))).toDF("id", "qv")
        .withColumn("cents",
          typedlit(Seq.empty[(Int, Seq[Long])])
            .cast("array<struct<cid: int, cv: array<bigint>>>"))
        .select(NearestCentroid(col("qv"), col("cents")))
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists(_.getMessage != null) &&
      chain(err).exists(t => Option(t.getMessage)
        .exists(_.contains("empty centroid list"))))
  }
}
