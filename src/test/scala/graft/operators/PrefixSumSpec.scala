package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Operator-level checks for [[PrefixSum]]: the stamped cumulative must
  * equal the sequential fold in sort order (the property that lets a SQL
  * window oracle hash-match q123), hold under any input partitioning,
  * and fail loudly on the two corruption paths (null weight, Long
  * overflow) instead of stamping garbage. */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private val rows = {
    val rnd = new scala.util.Random(23)
    // unique key k; weights collide and include zero
    rnd.shuffle(List.tabulate(997)(i => (i, (i * 7 % 31).toLong)))
  }

  test("inclusive cumulative equals the sequential fold, any input split") {
    val expect = rows.sortBy(_._1)
      .scanLeft((Int.MinValue, 0L)) { case ((_, acc), (k, w)) => (k, acc + w) }
      .tail.toMap
    for (parts <- Seq(1, 3, 16)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts)).toDF("k", "w")
      val got = PrefixSum.inclusive(df, Seq(col("k")), "w")
        .select(col("k"), col("cum")).as[(Int, Long)].collect().toMap
      assert(got == expect, s"diverged at parts=$parts")
    }
  }

  test("inclusiveMulti stamps N axes identically to N single passes") {
    val df = rows.map { case (k, w) => (k, w, (k * 13 % 17).toLong) }
      .toDF("k", "w", "v")
    val multi = PrefixSum.inclusiveMulti(df, Seq(col("k")),
        Seq("w", "v"), Seq("cw", "cv"))
      .select(col("k"), col("cw"), col("cv"))
      .as[(Int, Long, Long)].collect()
      .map { case (k, a, b) => k -> (a, b) }.toMap
    val single = {
      val a = PrefixSum.inclusive(df, Seq(col("k")), "w", "cw")
        .select(col("k"), col("cw")).as[(Int, Long)].collect().toMap
      val b = PrefixSum.inclusive(df, Seq(col("k")), "v", "cv")
        .select(col("k"), col("cv")).as[(Int, Long)].collect().toMap
      a.map { case (k, x) => k -> (x, b(k)) }
    }
    assert(multi == single)
  }

  test("matches the single-task window formulation") {
    val df = rows.toDF("k", "w")
    val window = df.selectExpr("k",
      "sum(w) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS cum")
      .as[(Int, Long)].collect().toMap
    val scanned = PrefixSum.inclusive(df, Seq(col("k")), "w")
      .select(col("k"), col("cum")).as[(Int, Long)].collect().toMap
    assert(scanned == window)
  }

  test("null weight fails loudly, not as a zero") {
    val df = Seq((1, Some(5L)), (2, None), (3, Some(7L)))
      .toDF("k", "w")
    val e = intercept[Exception] {
      PrefixSum.inclusive(df, Seq(col("k")), "w").collect()
    }
    assert(e.getMessage != null)
  }

  test("Long overflow fails loudly, not as a wraparound") {
    val df = Seq((1, Long.MaxValue - 1), (2, 5L)).toDF("k", "w")
    val e = intercept[Exception] {
      PrefixSum.inclusive(df, Seq(col("k")), "w").collect()
    }
    assert(e.getMessage != null)
  }

  test("non-BIGINT weight is rejected at analysis") {
    val df = Seq((1, 2)).toDF("k", "w") // w is INT
    val e = intercept[IllegalArgumentException] {
      PrefixSum.inclusive(df, Seq(col("k")), "w")
    }
    assert(e.getMessage.contains("BIGINT"))
  }
}
