package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity proof for the native SimHashAgg aggregate against the portable
  * SQL formulation (per-token md5 bit expansion + 64 sums) it replaced
  * in simhashFps, plus distribution invariance. */
class SimHashAggSpec extends SparkSpec {
  import spark.implicits._

  private def sqlFormulation(toks: org.apache.spark.sql.DataFrame) = toks
    .select(col("doc_id"), expr(
      """flatten(transform(split(md5(tok), ''), c ->
        |  transform(sequence(0, 3), b ->
        |    2*((instr('0123456789abcdef', c) - 1) >> b & 1) - 1)))""".stripMargin)
      .as("sb"))
    .groupBy(col("doc_id"))
    .agg(sum(col("sb").getItem(0)).as("s0"),
      (1 until 64).map(k => sum(col("sb").getItem(k)).as(s"s$k")): _*)
    .select(col("doc_id"),
      concat((0 until 64).map(k =>
        when(col(s"s$k") > 0, "1").otherwise("0")): _*).as("fp"))

  private def toks(dir: String) =
    graft.sources.Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))

  test("matches the SQL formulation on the test corpus") {
    val t = toks("/root/testdata/sf0.001")
    val a = sqlFormulation(t).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = t.groupBy(col("doc_id")).agg(SimHashAgg(col("tok")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.nonEmpty && a == b)
  }

  test("partition-count invariant (map-side combine correctness)") {
    val t = toks("/root/testdata/sf0.001")
    val base = t.groupBy(col("doc_id")).agg(SimHashAgg(col("tok")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (n <- Seq(1, 7)) {
      val got = t.repartition(n).groupBy(col("doc_id"))
        .agg(SimHashAgg(col("tok")).as("fp"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == base)
    }
  }

  test("fingerprint shape and null handling") {
    val df = Seq((1L, Some("hello")), (1L, Some("world")), (2L, None))
      .toDF("doc_id", "tok")
    val out = df.groupBy(col("doc_id")).agg(SimHashAgg(col("tok")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L).length == 64 && out(1L).forall(c => c == '0' || c == '1'))
    assert(out(2L) == "0" * 64) // all-null group: every vote sum is 0
  }
}
