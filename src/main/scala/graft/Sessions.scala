package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared session construction + full-plan execution for the harness
  * mains (Verify / Bench / Probe) — one place for local-mode config. */
object Sessions {
  def local(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // local-mode scan parallelism: the test/probe corpora are single
      // parquet FILES of a few-to-50 MB, which the 128 MB default reads
      // as ONE task — every pre-shuffle stage then runs single-threaded
      // (measured: the 100x k-means assign serialized 4 corpus scans on
      // one core). 8 MB splits the probe files across the pool; a real
      // cluster keeps the default (its inputs arrive as many files).
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      // AQE partition-coalescing policy, env-parameterised for A/Bs
      // (default = Spark's default, which favors parallelism; false
      // sizes reducers purely by advisory bytes — the documented
      // production setting for large clusters, but it serializes the
      // compute-heavy byte-small reducers this suite is full of).
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Release everything a query run may have pinned in the block manager.
    * `clearCache()` only drops CacheManager (DataFrame-level) entries;
    * localCheckpoint blocks (Dedup.withScratch results, ConnectedComponents
    * per-iteration checkpoints) are RDD-level persists that the
    * ContextCleaner reclaims lazily — across a 96-query sweep they pile up
    * and distort later timings (BENCH_r04 inflated untouched queries 2–4×).
    * Unpersisting them explicitly makes every timed pass start cold. */
  def releaseAll(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    // blocking: releaseAll always runs off-the-clock (between timed
    // passes), and an async drop would overlap the next measurement with
    // block-removal churn — the distortion this helper exists to stop
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  /** Execute the query's FULL physical plan and return the row count.
    * `df.count()` would instead plan Aggregate(count(1)) over the
    * query, letting the optimizer prune unreferenced projections and
    * final sorts — a projection-heavy operator would be "benchmarked"
    * as a bare scan. toRdd runs the executed plan as written. */
  def runFully(df: DataFrame): Long = {
    val rdd = df.queryExecution.toRdd
    rdd.mapPartitions(it => Iterator.single(it.size.toLong)).fold(0L)(_ + _)
  }
}
