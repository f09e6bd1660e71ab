package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity proof for the native WordShingles expression against the SQL
  * formulation it replaced (split + transform + concat [+ distinct]),
  * including the split(text,' ') edge rules: trailing/consecutive
  * spaces produce empty tokens. */
class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  private def sqlShingles(df: org.apache.spark.sql.DataFrame, dedup: Boolean) = {
    val core =
      """transform(sequence(0, size(ws)-3),
        |  i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))""".stripMargin
    df.select(col("id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("id"),
        expr(if (dedup) s"array_distinct($core)" else core).as("sh"))
  }

  test("matches the SQL formulation on the corpus, distinct and not") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").as("id"), col("text"))
    for (dedup <- Seq(true, false)) {
      val a = sqlShingles(docs, dedup).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      val b = docs
        .select(col("id"), WordShingles(col("text"), 3, dedup).as("sh"))
        .filter(size(col("sh")) > 0)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      assert(a.nonEmpty && a == b, s"dedup=$dedup")
    }
  }

  test("split-rule edges: consecutive/trailing spaces, short docs, k=1") {
    val docs = Seq((1L, "a b  c d "), (2L, "x y"), (3L, ""), (4L, "p q r"))
      .toDF("id", "text")
    val a = sqlShingles(docs, false).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val b = docs.select(col("id"), WordShingles(col("text"), 3, false).as("sh"))
      .filter(size(col("sh")) > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(a == b)
    // k=1 distinct == distinct token list in first-occurrence order
    val t1 = docs.filter(col("id") === 1)
      .select(WordShingles(col("text"), 1, distinct = true)).head().getSeq[String](0)
    assert(t1 == Seq("a", "b", "", "c", "d"))
  }
}
