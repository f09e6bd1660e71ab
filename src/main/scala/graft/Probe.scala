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
    if (name == "twolevel") {
      // selector probe (round-10 ask #2): a synthetic corpus big enough
      // that adaptive k crosses a LOWERED flat ceiling, so assignAuto
      // takes the two-level path — and the flat path at the same k runs
      // beside it for the cost ratio. Deterministic hash-derived
      // vectors; n from args(2) (default 1M -> k = n/250 = 4000).
      import org.apache.spark.sql.functions._
      val n = if (args.length > 2) args(2).toLong else 1000000L
      val dim = 16
      val iters = 2
      val k = math.max(8L, (n + 249L) / 250L).toInt // the adaptive-k curve
      val v = spark.range(n).select(col("id"), expr(
        s"transform(sequence(1, $dim), i -> pmod(CAST(hash(id * $dim + i) AS BIGINT), 1000000L))")
        .as("qv")).persist()
      v.count()
      spark.conf.set(graft.operators.KMeans.FlatKCeilingKey, (k - 1).toString)
      val (dt2, n2) = timed(spark)(
        graft.operators.KMeans.assignAuto(v, k, iters, dim))
      println(f"PROBE twolevel n=$n k=$k auto(two-level): $dt2%.2f s ($n2 rows)")
      val (dt1, n1) = timed(spark)(
        graft.operators.KMeans.assign(v, k, iters, dim))
      println(f"PROBE twolevel n=$n k=$k flat:            $dt1%.2f s ($n1 rows)")
      v.unpersist()
      spark.stop(); return
    }
    if (name == "q120stats") {
      println(graft.queries.Dedup.q120CandStats(spark, sfDir))
      spark.stop(); return
    }
    if (name == "annrecall") {
      // recall@K of an ANN query vs brute truth at this dir's scale;
      // queryCap bounds the brute side at the big dirs
      args.drop(3).foreach { a =>
        if (a.startsWith("queryCap="))
          sys.props("graft.probe.queryCap") = a.stripPrefix("queryCap=")
      }
      println("PROBE annrecall: " +
        graft.queries.Similarity.serveRecall(spark, sfDir, args(2)))
      spark.stop(); return
    }
    if (name == "suite") {
      // time several queries in one JVM: runMain graft.Probe suite <dir> q36_x,q37_y
      // A failing query (e.g. a 100x probe dir that only carries the four
      // big tables) reports FAIL and the suite continues — tools/probes.py
      // records it as n/a instead of losing the whole batch.
      // Optional trailing `queryCap=N` pins the ANN family's query set
      // to its first N query ids (the fixed-query serve probes — r13
      // verdict ask #1); set BEFORE any SparkEntry access so even
      // SQL frozen at query-registry init sees the cap.
      args.drop(3).foreach { a =>
        if (a.startsWith("queryCap="))
          sys.props("graft.probe.queryCap") = a.stripPrefix("queryCap=")
      }
      args(2).split(",").toSeq.foreach { qn =>
        try {
          val (dt, n) = timed(spark)(SparkEntry.queries(qn)(spark, sfDir))
          println(f"PROBE $qn: $dt%.2f s ($n rows)")
        } catch {
          // NonFatal only: after an OutOfMemoryError/LinkageError the
          // shared JVM's remaining timings are garbage — let the fatal
          // error abort the batch (tools/probes.py fail-louds on a
          // batch with no timings) instead of recording them (ADVICE r13)
          case scala.util.control.NonFatal(e) =>
            Sessions.releaseAll(spark)
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString
            println(s"PROBE $qn: FAIL ($msg)")
        }
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
