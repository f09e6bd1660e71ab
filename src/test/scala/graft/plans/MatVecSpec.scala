package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Vectors

/** Native MatVec expression: interpreted vs codegen parity, per-row
  * equality with DotProduct's fold, element-type and truncation
  * conventions. */
class MatVecSpec extends SparkSpec {
  import spark.implicits._

  private val m = Array.tabulate(5, 64)((k, i) =>
    (math.sin(k * 64 + i) * 0.1).toFloat)
  private val v = Array.tabulate(64)(i => (math.cos(i) * 0.1).toFloat)

  private def jvmRow(k: Int): Double = Vectors.dotJvm(m(k), v)

  test("each output component equals DotProduct's bit-exact fold") {
    val got = Seq((m.map(_.toSeq).toSeq, v)).toDF("m", "v")
      .select(MatVec(col("m"), col("v")).as("p"))
      .head.getSeq[Double](0)
    assert(got.length == 5)
    (0 until 5).foreach(k => assert(got(k) == jvmRow(k), s"row $k"))
  }

  test("interpreted eval equals codegen result") {
    val df = Seq((m.map(_.toSeq).toSeq, v)).toDF("m", "v")
    val viaCodegen = df.select(MatVec(col("m"), col("v")))
      .head.getSeq[Double](0)
    val conf = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val interpreted = df.select(MatVec(col("m"), col("v")))
        .head.getSeq[Double](0)
      assert(interpreted == viaCodegen)
    } finally spark.conf.set(conf, prev)
  }

  test("double matrix rows and row/vector truncation follow DotProduct") {
    val md = m.map(_.map(_.toDouble).toSeq).toSeq
    val gotD = Seq((md, v)).toDF("m", "v")
      .select(MatVec(col("m"), col("v")).as("p"))
      .head.getSeq[Double](0)
    (0 until 5).foreach(k => assert(gotD(k) == jvmRow(k)))
    // short row: partial sum over the common prefix, zip_with-style
    val shortRow = Seq(Seq(m(0).take(3).toSeq))
    val got3 = Seq((shortRow.head, v)).toDF("m", "v")
      .select(MatVec(col("m"), col("v")))
      .head.getSeq[Double](0)
    val want = (0 until 3).foldLeft(0.0)((acc, i) =>
      acc + m(0)(i).toDouble * v(i).toDouble)
    assert(got3.head == want)
  }
}
