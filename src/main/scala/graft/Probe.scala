package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: time one named query and dump its formatted
  * plan. Usage: runMain graft.Probe <queryName> <sfDir> [explain] */
object Probe {
  /** Shared warmup + steady-state timing (measurement policy — full-plan
    * execution, cache clearing — lives in Sessions.runFully; this only
    * adds the warmup/clear/clock shape so the modes can't diverge). */
  private def timed(spark: org.apache.spark.sql.SparkSession)(
      build: => org.apache.spark.sql.DataFrame): (Double, Long) = {
    Sessions.runFully(build); Sessions.releaseAll(spark) // warmup
    val t0 = System.nanoTime()
    val n = Sessions.runFully(build)
    val dt = (System.nanoTime() - t0) / 1e9
    Sessions.releaseAll(spark)
    (dt, n)
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)
    if (name == "fps") {
      (1 to 2).foreach { i =>
        var t0 = System.nanoTime()
        val df = graft.queries.Dedup.simhashFps(spark, sfDir)
        val n1 = df.count()
        println(f"PROBE fps-aqe run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n1 rows)")
        t0 = System.nanoTime()
        val ck = graft.queries.Dedup.simhashFps(spark, sfDir).localCheckpoint()
        println(f"PROBE fps-ckpt run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      spark.stop(); return
    }
    if (name == "sql") {
      graft.sources.Tables.registerAll(spark, sfDir)
      val sql = args(2)
      val (dt, n) = timed(spark)(spark.sql(sql))
      println(f"PROBE sql: $dt%.2f s ($n rows)")
      spark.stop(); return
    }
    if (name == "suite") {
      // time several queries in one JVM: runMain graft.Probe suite <dir> q36_x,q37_y
      args(2).split(",").toSeq.foreach { qn =>
        val (dt, n) = timed(spark)(SparkEntry.queries(qn)(spark, sfDir))
        println(f"PROBE $qn: $dt%.2f s ($n rows)")
      }
      spark.stop(); return
    }
    val fn = SparkEntry.queries(name)
    if (args.contains("explain")) {
      // lazyScratch: scratch-cached builders (q36/q37/q63/...) otherwise
      // materialize eagerly and explain() would only show a checkpoint
      // scan; the leaked persists are dropped by the releaseAll below
      sys.props("graft.lazyScratch") = "1"
      try fn(spark, sfDir).explain("formatted")
      finally { sys.props.remove("graft.lazyScratch"); Sessions.releaseAll(spark) }
    }
    // warmup + 2 timed runs; "total" is the honest number — scratch-cached
    // builders do their work eagerly in the build phase
    Sessions.runFully(fn(spark, sfDir)); Sessions.releaseAll(spark)
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      val n = Sessions.runFully(df)
      val t2 = System.nanoTime()
      println(f"PROBE $name run$i: total ${(t2 - t0) / 1e9}%.2f s " +
        f"(build ${(t1 - t0) / 1e9}%.2f + exec ${(t2 - t1) / 1e9}%.2f) ($n rows)")
      Sessions.releaseAll(spark)
    }
    spark.stop()
  }
}
