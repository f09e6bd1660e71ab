package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity proof for the native CdcBoundaries expression against the
  * portable SQL formulation (q49's per-position gram-hash list filtered
  * by divisibility), plus hand-computed edge cases and the boundary
  * re-synchronization property that motivates content-defined chunking. */
class CdcBoundariesSpec extends SparkSpec {
  import spark.implicits._

  private def sqlFormulation(df: org.apache.spark.sql.DataFrame,
      divisor: Int) = df
    .select(col("doc_id"),
      expr("transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT))")
        .as("codes"))
    .select(col("doc_id"), expr(
      s"""CASE WHEN size(codes) >= 8 THEN
         |  filter(sequence(1, size(codes) - 7), i ->
         |    aggregate(slice(codes, i + 1, 7), codes[i - 1],
         |      (a, b) -> (a*31 + b) % 1000000007) % $divisor = 0)
         |ELSE array() END""".stripMargin).cast("array<int>").as("bs"))

  private def nativeFormulation(df: org.apache.spark.sql.DataFrame,
      divisor: Int) = df
    .select(col("doc_id"), CdcBoundaries(col("text"), divisor).as("bs"))

  test("matches the SQL formulation on the test corpus") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001",
      "documents")
    for (d <- Seq(16, 64)) {
      val a = sqlFormulation(docs, d).collect().map(_.toSeq).toSet
      val b = nativeFormulation(docs, d).collect().map(_.toSeq).toSet
      assert(a.nonEmpty && a == b, s"divisor $d")
    }
    // at least one real boundary must exist or the corpus test is vacuous
    val hits = nativeFormulation(docs, 16)
      .select(explode(col("bs"))).count()
    assert(hits > 0, "no boundaries at divisor 16 - vacuous corpus test")
  }

  test("edge cases: short input, exact gram, divisor 1") {
    val docs = Seq(
      (1L, "abc"),       // shorter than one gram -> no boundaries
      (2L, "abcdefgh"),  // exactly one gram
      (3L, "the same words the same words again")
    ).toDF("doc_id", "text")
    val a = sqlFormulation(docs, 64).collect().map(_.toSeq).toSet
    val b = nativeFormulation(docs, 64).collect().map(_.toSeq).toSet
    assert(a == b)
    val short = nativeFormulation(docs.filter(col("doc_id") === 1), 64)
      .select(size(col("bs"))).head().getInt(0)
    assert(short == 0)
    // divisor 1: EVERY gram position is a boundary
    val every = nativeFormulation(docs.filter(col("doc_id") === 2), 1)
      .select(col("bs")).head().getSeq[Int](0)
    assert(every == Seq(1))
    val all3 = nativeFormulation(docs.filter(col("doc_id") === 3), 1)
      .select(size(col("bs"))).head().getInt(0)
    val n3 = "the same words the same words again".length
    assert(all3 == n3 - 7)
  }

  test("boundaries re-synchronize after an insertion") {
    // the CDC property: prepending text shifts positions but the
    // boundary GRAMS (content) past the edit are preserved - unlike a
    // fixed stride, which re-keys everything downstream of the edit
    val base = "x1 y2 z3 q7 w9 common tail that stays identical here"
    val edited = "INSERTED PREFIX " + base
    val shift = "INSERTED PREFIX ".length
    def bounds(t: String, d: Int) = nativeFormulation(
      Seq((1L, t)).toDF("doc_id", "text"), d)
      .select(col("bs")).head().getSeq[Int](0)
    val d = 4 // dense boundaries so the tail surely contains one
    val b0 = bounds(base, d)
    val b1 = bounds(edited, d)
    // every boundary of the ORIGINAL whose gram lies fully past the
    // edit re-appears in the edited text, shifted by the prefix length
    val tail0 = b0.filter(_ >= 1) // all: edit is a pure prefix
    assert(tail0.nonEmpty, "need at least one boundary to check")
    tail0.foreach { p => assert(b1.contains(p + shift),
      s"boundary at $p did not re-synchronize") }
  }
}
