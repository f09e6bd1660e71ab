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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is written as parquet TIMESTAMP(NANOS), which Spark has no
    // native type for. Read it as raw nanos and floor-divide to µs (the
    // generated data is µs-precision, so this is lossless); `div` keeps the
    // arithmetic integral (a double division would lose precision on
    // ~1.7e18 nano epochs).
    if (!spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false").toBoolean)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view (for spark.sql-driven tests). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
