package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Vector math over `array<float>` embedding columns, written as portable
  * left-fold expressions so each formula has a bit-exact DuckDB twin (the
  * fold order is fixed, so doubles accumulate identically in both engines).
  *
  * Scale design (100 TB): these are pure per-row projections compiled by
  * Catalyst into codegen'd higher-order-function loops — no UDF boxing, no
  * shuffle. The reference engine has no vector ops at all (SURVEY §1.3);
  * this is part of the training-data-pipeline extension class.
  */
object Vectors {
  val Dim = 64 // embeddings table: embedding FLOAT[64] (FIXTURES.md)

  /** Exact dot product: left fold over double-cast elements. */
  def dot(a: String, b: String): Column = expr(
    s"""aggregate(sequence(0, ${Dim - 1}), CAST(0 AS DOUBLE),
       |  (acc, i) -> acc + CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))""".stripMargin)

  /** DuckDB twin of [[dot]] (list_sum of a list_transform is a left fold;
    * DuckDB lists are 1-indexed, Spark arrays 0-indexed). */
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, ${Dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  /** Signed random projection bit j: sign of <v, h_j> where hyperplane h_j
    * has deterministic pseudo-random +-1 weights derived from md5("j:i")'s
    * first hex nibble parity. Portable: identical hashes in both engines. */
  def srpBit(v: String, j: Int): Column = expr(
    s"""IF(aggregate(sequence(0, ${Dim - 1}), CAST(0 AS DOUBLE),
       |  (acc, i) -> acc + CAST($v[i] AS DOUBLE) *
       |    (2 * (instr('0123456789abcdef', substr(md5(concat('$j:', i)), 1, 1)) % 2) - 1))
       |  >= 0, 1, 0)""".stripMargin)

  def srpBitSql(v: String, j: Int): String =
    s"""CASE WHEN list_sum(list_transform(range(1, ${Dim + 1}),
       |  i -> CAST($v[i] AS DOUBLE) *
       |    (2 * (strpos('0123456789abcdef', substr(md5('$j:' || (i-1)), 1, 1)) % 2) - 1)))
       |  >= 0 THEN 1 ELSE 0 END""".stripMargin
}
