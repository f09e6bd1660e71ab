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

  /** DuckDB resource caps prepended to every oracle statement. DuckDB's
    * default memory_limit is 80% of host RAM (~100 GB here), so over a
    * full-inventory pass (the full `allSpecs` registry) its buffer
    * manager never evicts and the oracle process's RSS ratchets up — on
    * a contended driver host that ended in malloc failures on the five
    * allocation-heaviest oracles
    * (CORRECTNESS_r10 q36–q39/q41, `bad allocation` at ~256 KiB). Every
    * one of those queries runs in <64 MB when DuckDB is actually asked
    * to stay small (measured at sf0.01), so the fix is a hard cap:
    * bounded footprint, spill instead of death. 4 GB has cleared every
    * full pass since (218 entries in r11, 259 in r12) with headroom
    * (the two oracles that needed 8 GB /
    * 4 GB — q186/q208 — were chained-recurrence CTEs that DuckDB's
    * default inlining re-expanded ~3^k / ~9^r times; AS MATERIALIZED at
    * their declaration sites runs both in <512 MB / <0.3 s) while
    * bounding the pass at ~25× under the default (an in-memory
    * DuckDB
    * already defaults temp_directory to `.tmp`, and SETTING it is the
    * one cap that CANNOT be repeated — it throws once the directory has
    * been used, which would poison every later query in the pass, so it
    * stays untouched). memory_limit and threads re-SET cleanly any
    * number of times (verified), and SET is connection-scoped, so
    * carrying the prefix on every statement makes the cap hold whatever
    * subset or order the driver runs; duckdb-python executes
    * multi-statement strings through both `.sql()` and `.execute()` and
    * returns the final SELECT's relation, so the driver's
    * canonicalize/hash path is unchanged. */
  private val OraclePragmas =
    "SET memory_limit='4GB'; SET threads=8;\n"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(q => q.oracle.map(sql => q.name -> (OraclePragmas + sql)))
      .toMap
}
