package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Dedup, Multimodal, Profiling, QuerySpec, Relational, Similarity, Temporal, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory is assembled from per-theme registries under
  * graft.queries; every entry carries its own DuckDB oracle SQL where the
  * operation is SQL-expressible.
  */
object SparkEntry {
  /** Full inventory (order preserved for stable reporting). */
  def allSpecs: Seq[QuerySpec] = {
    val specs =
      Relational.specs ++ TextOps.specs ++ Dedup.specs ++ Similarity.specs ++
        Multimodal.specs ++ Profiling.specs ++ Temporal.specs
    // a duplicated name would silently shadow a query through .toMap
    require(specs.map(_.name).distinct.size == specs.size,
      "duplicate query name in the inventory: " +
        specs.groupBy(_.name).filter(_._2.size > 1).keys.mkString(", "))
    specs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_tpch_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
