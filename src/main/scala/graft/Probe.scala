package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: time one named query and dump its formatted
  * plan. Usage: runMain graft.Probe <queryName> <sfDir> [explain] */
object Probe {
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
      Sessions.runFully(spark.sql(sql)) // warmup
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = Sessions.runFully(spark.sql(sql))
        println(f"PROBE sql run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
      spark.stop(); return
    }
    if (name == "suite") {
      // time several queries in one JVM: runMain graft.Probe suite <dir> q36_x,q37_y
      val names = args(2).split(",").toSeq
      names.foreach { qn =>
        val fn = SparkEntry.queries(qn)
        Sessions.runFully(fn(spark, sfDir)); spark.catalog.clearCache() // warmup
        val t0 = System.nanoTime()
        val n = Sessions.runFully(fn(spark, sfDir))
        println(f"PROBE $qn: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    val fn = SparkEntry.queries(name)
    if (args.contains("explain")) fn(spark, sfDir).explain("formatted")
    // warmup + 2 timed runs
    Sessions.runFully(fn(spark, sfDir)); spark.catalog.clearCache()
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      val n = Sessions.runFully(df)
      val t2 = System.nanoTime()
      println(f"PROBE $name run$i: build ${(t1 - t0) / 1e9}%.2f s + " +
        f"count ${(t2 - t1) / 1e9}%.2f s ($n rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
