package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bounded file sources/sinks (SURVEY §2.1): the reference ships only the
  * `InputFormat`/`OutputFormat` *interfaces* with no concrete format
  * (`flink-core/.../api/common/io/InputFormat.java`, Dead row); Spark's
  * DataSource v2 supplies parquet/csv/json/text with vectorized reads,
  * predicate pushdown, and partitioned layouts. This facade standardizes
  * options (csv keeps headers + an explicit null marker; json/parquet/orc
  * are schema-carrying; csv round-trips losslessly via the
  * explicit-schema read overload).
  *
  * Scale note: `write` partitions by the dataframe's partitioning — at
  * 100 TB, call `df.repartition(n)` (or partitionBy on a key column)
  * first so file counts and sizes stay sane; readers parallelize per
  * file split either way.
  */
object IO {
  def readParquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Schema-inferring CSV read: convenient, but inference retypes
    * columns ("007" comes back as an int) and rescans the files — for
    * a lossless round-trip pass the writer's schema explicitly. */
  def readCsv(s: SparkSession, path: String): DataFrame =
    s.read.option("header", "true").option("nullValue", "\\N")
      .option("inferSchema", "true").csv(path)

  /** Exact-schema CSV read — the lossless round-trip counterpart of
    * [[writeCsv]]. */
  def readCsv(s: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.read.option("header", "true").option("nullValue", "\\N")
      .schema(schema).csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("nullValue", "\\N").csv(path)

  def readJson(s: SparkSession, path: String): DataFrame =
    s.read.json(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readText(s: SparkSession, path: String): DataFrame =
    s.read.text(path)

  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** XML (native in Spark 4 — the former spark-xml package absorbed
    * into sql/core): one row per `rowTag` element, schema inferred the
    * csv/json way. The last first-class text format the registry
    * lacked; enterprise feeds still ship it. */
  def readXml(s: SparkSession, path: String, rowTag: String = "row"): DataFrame =
    s.read.option("rowTag", rowTag).xml(path)

  def writeXml(df: DataFrame, path: String, rowTag: String = "row"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("rootTag", "rows").option("rowTag", rowTag).xml(path)

  /** Hive-style partitioned layout (`path/col=value/part-*.parquet`):
    * the 100 TB directory shape — readers prune entire partitions from
    * the listing when a filter hits `cols` (PartitionFilters in the
    * scan, no file I/O at all for pruned values). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Temp directory registered for deletion at JVM exit — the shared
    * index-scratch helper behind the q187/q189 persisted-index builds
    * (previously duplicated in Similarity and TextOps; round-9
    * advisory). The walk stream is CLOSED via try/finally (an unclosed
    * Files.walk held a directory handle during deletion), and deletion
    * failures are LOGGED, not swallowed — a corpus-sized index dir
    * surviving in /tmp should be visible. */
  def tempDirCleanedAtExit(prefix: String): String = {
    val base = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val walk = java.nio.file.Files.walk(base)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach { p =>
            try java.nio.file.Files.deleteIfExists(p)
            catch {
              case e: java.io.IOException =>
                System.err.println(
                  s"graft IO: failed to delete index scratch $p: $e")
            }
          }
      } finally walk.close()
    }))
    base.toString
  }
}
