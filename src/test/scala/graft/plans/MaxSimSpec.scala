package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native MaxSim expression: equality with the per-subvector brute
  * force, interpreted vs codegen parity, and the length contract. */
class MaxSimSpec extends SparkSpec {
  import spark.implicits._

  private val M = 8
  private val S = 8
  private val a = Array.tabulate(M * S)(i => (math.sin(i) * 0.3).toFloat)
  private val b = Array.tabulate(M * S)(i => (math.cos(i * 2) * 0.3).toFloat)

  private def brute(x: Array[Float], y: Array[Float]): Double = {
    var score = 0.0
    for (i <- 0 until M) {
      var best = Double.NegativeInfinity
      for (j <- 0 until M) {
        var acc = 0.0
        for (d <- 0 until S)
          acc += x(i * S + d).toDouble * y(j * S + d).toDouble
        if (acc > best) best = acc
      }
      score += best
    }
    score
  }

  test("equals the subvector brute force; asymmetric in its arguments") {
    val got = Seq((a, b)).toDF("x", "y")
      .select(MaxSim(col("x"), col("y"), M).as("s"))
      .head.getDouble(0)
    assert(got == brute(a, b))
    val rev = Seq((a, b)).toDF("x", "y")
      .select(MaxSim(col("y"), col("x"), M).as("s"))
      .head.getDouble(0)
    assert(rev == brute(b, a)) // query/doc roles are not interchangeable
  }

  test("interpreted eval equals codegen result") {
    val df = Seq((a, b)).toDF("x", "y")
    val viaCodegen = df.select(MaxSim(col("x"), col("y"), M))
      .head.getDouble(0)
    val conf = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val interpreted = df.select(MaxSim(col("x"), col("y"), M))
        .head.getDouble(0)
      assert(interpreted == viaCodegen)
    } finally spark.conf.set(conf, prev)
  }

  test("m = 1 degenerates to the plain dot product") {
    val dot = Seq((a, b)).toDF("x", "y")
      .select(DotProduct(col("x"), col("y")).as("d"))
      .head.getDouble(0)
    val ms = Seq((a, b)).toDF("x", "y")
      .select(MaxSim(col("x"), col("y"), 1).as("s"))
      .head.getDouble(0)
    assert(ms == dot)
  }

  test("length mismatch and non-multiple lengths fail loudly") {
    val bad = Seq((a, b.take(63))).toDF("x", "y")
    val e = intercept[Exception] {
      bad.select(MaxSim(col("x"), col("y"), M)).head
    }
    assert(e.getMessage.contains("graft_maxsim") ||
      Option(e.getCause).exists(_.getMessage.contains("graft_maxsim")))
  }
}
