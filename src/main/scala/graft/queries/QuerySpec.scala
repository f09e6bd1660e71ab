package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One inventory entry: a Spark implementation plus (when SQL-expressible)
  * an equivalent DuckDB oracle over the same parquet tables. Column names
  * must match exactly between the two — the driver sorts columns by name
  * and hashes values (see the builder contract in SparkEntry).
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def sqlBacked(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, run, Some(oracle))

  def rowsOnly(name: String)(
      run: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, run, None)
}
