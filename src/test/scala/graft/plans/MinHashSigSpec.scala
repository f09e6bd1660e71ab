package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Byte-parity proof for MinHashSig against the SQL formulation
  * (K x array_min(transform(sh, s -> md5('i:' || s)))). */
class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16

  test("matches the SQL formulation on corpus shingles") {
    val sh = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        WordShingles(col("text"), 3, distinct = true).as("sh"))
      .filter(size(col("sh")) > 0)
    val sqlCols = (0 until K).map(i =>
      expr(s"array_min(transform(sh, s -> md5(concat('$i:', s))))"))
    val a = sh.select(col("doc_id"), array(sqlCols: _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val b = sh.select(col("doc_id"), MinHashSig(col("sh"), K).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(a.nonEmpty && a == b)
  }

  test("single shingle and unicode shingles hash identically") {
    val df = Seq((1L, Seq("only one")), (2L, Seq("é中Ж", "plain"))).toDF("id", "sh")
    val sqlCols = (0 until K).map(i =>
      expr(s"array_min(transform(sh, s -> md5(concat('$i:', s))))"))
    val a = df.select(col("id"), array(sqlCols: _*)).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val b = df.select(col("id"), MinHashSig(col("sh"), K)).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(a == b)
  }
}
