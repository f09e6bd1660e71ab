package graft

/** Benchmark main: one JSON line with per-query seconds on the SF dir from
  * SPARK_GRAFT_SF_DIR. Each query runs twice: an untimed warmup (JIT +
  * codegen + file-cache) and a timed steady-state pass — single-shot
  * timings on a cold JVM mostly measure classloading, which a long-lived
  * cluster never pays per query. Queries execute their FULL physical plan
  * (Sessions.runFully) — a count() would let the optimizer prune the
  * projections and sorts under test. Failed queries report -1. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // releaseAll after every run: clearCache alone misses localCheckpoint
    // RDD blocks (withScratch / CC iterations), whose lazy reclamation
    // distorted BENCH_r04 — the timed pass must never reuse warmup state
    // nor inherit block-manager churn from earlier queries.
    ordered.foreach { case (_, fn) =>
      try Sessions.runFully(fn(spark, sfDir)) catch { case _: Throwable => () }
      Sessions.releaseAll(spark)
    }
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { Sessions.runFully(fn(spark, sfDir)); true }
        catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      Sessions.releaseAll(spark)
      name -> (if (ok) dt else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // The stdout line gets drowned in sbt [info]/[error] prefixes and tail
    // truncation on long sweeps (BENCH_r05/r06 both parsed as null). Also
    // write the metric object to a file so the driver — and any local
    // cross-round diff — can read it without scraping logs.
    sys.env.get("SPARK_GRAFT_BENCH_OUT").orElse(Some("BENCH_LAST.json"))
      .foreach { p =>
        try java.nio.file.Files.write(java.nio.file.Paths.get(p),
          line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        catch { case _: Throwable => () }
      }
    spark.stop()
    // Re-print after spark.stop() so the metric is the LAST stdout line —
    // immune to executor-shutdown log interleaving and tail truncation.
    println(line)
  }
}
