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

  /** Exact dot product as a native Catalyst expression
    * ([[graft.plans.DotProduct]]): one compact node with a codegen'd
    * loop, left-to-right accumulation — bit-identical to [[dotSql]]'s
    * fold while keeping vector-scoring plans inside WholeStageCodegen
    * (an unrolled 64-term SQL sum blows past codegen method limits and
    * drops whole stages to interpreted eval). */
  def dot(a: String, b: String): Column =
    graft.plans.DotProduct(org.apache.spark.sql.functions.col(a),
      org.apache.spark.sql.functions.col(b))

  /** DuckDB twin of [[dot]] — identical term order, left-assoc `+`
    * (DuckDB lists are 1-indexed, Spark arrays 0-indexed). The outer
    * parens matter: callers embed this string in `.../(x*y)` contexts,
    * where an unparenthesized chain would bind only its last term. */
  def dotSql(a: String, b: String, dim: Int = Dim): String =
    (1 to dim)
      .map(i => s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)")
      .mkString("(", " + ", ")")

  /** JVM twin of [[dot]]: identical left-to-right double accumulation, so
    * bit-exact vs the SQL/oracle chains. For hot all-pairs loops where
    * codegen bails out on 64-term expression trees (q39): a while-loop is
    * ~500x faster than interpreted Catalyst expression evaluation. */
  def dotJvm(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < Dim) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** +-1 weight of hyperplane j at dim i: parity of md5("j:i")'s first hex
    * nibble. Precomputed driver-side for the Spark plan (the md5 of a
    * constant is a constant); the DuckDB oracle computes the same value
    * inline, so both engines use identical hyperplanes. */
  private def srpWeight(j: Int, i: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$i".getBytes("UTF-8"))
    val nib = (h(0) >> 4) & 0xf // value of the first hex char
    2 * ((nib + 1) % 2) - 1     // instr('0123...f', c) = nib+1
  }

  /** Signed random projection bit j: sign of <v, h_j> with the hyperplane
    * as a literal float array through the native dot product (weights are
    * +-1, exactly representable; same left-assoc accumulation order as
    * the oracle's fold). */
  def srpBit(v: String, j: Int): Column = {
    import org.apache.spark.sql.functions.when
    when(srpProj(v, j) >= 0, 1).otherwise(0)
  }

  /** The raw projection <v, h_j> behind [[srpBit]] — q229's multi-probe
    * needs the MARGIN (|proj| = distance to the hyperplane, the
    * flip-likelihood ordering of Lv et al.'s query-directed probing),
    * not just the sign. */
  def srpProj(v: String, j: Int): Column = {
    import org.apache.spark.sql.functions.{col, typedlit}
    val w = typedlit((0 until Dim).map(i => srpWeight(j, i).toFloat).toArray)
    graft.plans.DotProduct(col(v), w)
  }

  /** +-1 Johnson–Lindenstrauss sign for projection row k, dim i: parity
    * of md5("rp:k:i")'s first hex nibble — a key space disjoint from
    * [[srpWeight]]'s "j:i" hyperplanes, so the q198 projection and the
    * q41 LSH tables are statistically independent. Driver-side constant
    * (md5 of a constant is a constant); the oracle bakes the SAME signs
    * into its SQL as +-1 literals. */
  def rpSign(k: Int, i: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$k:$i".getBytes("UTF-8"))
    val nib = (h(0) >> 4) & 0xf
    2 * ((nib + 1) % 2) - 1
  }

  def srpBitSql(v: String, j: Int): String =
    s"""CASE WHEN ${srpProjSql(v, j)}
       |  >= 0 THEN 1 ELSE 0 END""".stripMargin

  /** DuckDB twin of [[srpProj]]: the raw fold [[srpBitSql]] signs. */
  def srpProjSql(v: String, j: Int): String =
    s"""list_sum(list_transform(range(1, ${Dim + 1}),
       |  i -> CAST($v[i] AS DOUBLE) *
       |    (2 * (strpos('0123456789abcdef', substr(md5('$j:' || (i-1)), 1, 1)) % 2) - 1)))"""
      .stripMargin
}
