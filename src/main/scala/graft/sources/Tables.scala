package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md / FIXTURES.md).
  *
  * The reference engine ships only I/O *interfaces* with no concrete format
  * (`flink-core/.../api/common/io/InputFormat.java`, SURVEY §2.1); on Spark
  * the parquet DataSource v2 provides vectorized, predicate-pushdown,
  * column-pruned scans for free, so the whole "source" layer is this thin
  * registry. At cluster scale the same calls read partitioned directories;
  * nothing here assumes single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // Resolved-DataFrame memo per (session, dir, table): every
  // spark.read.parquet call re-lists the path and re-reads a parquet
  // footer for schema inference — pure driver time, paid by every
  // Tables() reference of every query (a bench sweep makes thousands).
  // A DataFrame is an immutable logical plan, so handing the same one
  // out is plan memoization, not result caching: execution still scans
  // the files each run. Weak session keys let stopped test sessions be
  // collected (the registerAll pattern below).
  private val dfCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = dfCache.synchronized {
      var m = dfCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        dfCache.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent(s"$dir/$name", _ => load(spark, dir, name))
  }

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts has been written two ways across driver rounds:
    //  - TIMESTAMP(NANOS), which Spark has no native type for: read it as
    //    raw nanos (the legacy conf) and floor-divide to µs — the generated
    //    data is µs-precision, so this is lossless, and `div` keeps the
    //    arithmetic integral (a double division would lose precision on
    //    ~1.7e18 nano epochs);
    //  - TIMESTAMP(MICROS) isAdjustedToUTC=false, which arrives as
    //    TIMESTAMP_NTZ: cast to the session type (TimestampType, session
    //    TZ pinned UTC in every entrypoint) so downstream queries and the
    //    verify dump see one ts type regardless of which file shape the
    //    round's generator produced.
    // The conf only affects nanos columns, so setting it is harmless for
    // µs files; the branch below keys off the type the scan actually
    // resolved.
    if (!spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false").toBoolean)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampType => df
        case _ =>
          df.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
      }
    } else df
  }

  /** Spread a scan across the session's cores ONLY when it arrives with
    * fewer input splits than the parallelism — the single-local-file test
    * corpus, which would otherwise serialize all downstream per-row work
    * (shingling, hashing) onto one task. A real multi-file corpus already
    * has thousands of splits, and an unconditional repartition there is a
    * full shuffle of the corpus *text* — the largest avoidable exchange
    * in the dedup/decontamination family. The partition count comes from
    * the physical scan plan (file listing), no job is run. */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions < p) df.repartition(p) else df
  }

  // Scan-width memo for the (dir, table) call shape: the split count is
  // a function of the immutable input files, and deriving it per call
  // builds a fresh physical plan each time (the Similarity spreadRead
  // rationale, ADVICE r14).
  private val spreadNeeded =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** [[spread]] applied to a table scan — the common call shape. */
  def spread(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = apply(spark, dir, name)
    val p = spark.sparkContext.defaultParallelism
    // parallelism is part of the key: tests run sessions of different
    // core counts in one JVM and the decision depends on both sides
    val needs = spreadNeeded.computeIfAbsent(s"$dir/$name@$p", _ =>
      java.lang.Boolean.valueOf(df.queryExecution.toRdd.getNumPartitions < p))
    if (needs) df.repartition(p) else df
  }

  // Last dir registered per session. registerAll is called by every
  // SQL-mode query builder (q53-q55), so without memoization a bench or
  // verify sweep re-reads all 10 parquet footers and re-plans 10 views on
  // every invocation — ~5s of pure registration overhead per query at
  // sf0.1. Weak keys let stopped test sessions be collected.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Register every table as a temp view (for spark.sql-driven tests).
    * Idempotent per (session, dir): repeat calls with the same dir are
    * free; a different dir re-registers (views point at one dir at a time).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    if (registered.get(spark) != dir) {
      all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
      registered.put(spark, dir)
    }
}
