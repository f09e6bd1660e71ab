package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GramAgg: parity with the explode-and-group formulation, merge-order
  * invariance under partitioning sweeps, and the fail-loud boundaries
  * (ragged corpus, Long overflow). */
class GramAggSpec extends SparkSpec {
  import spark.implicits._

  private def quant(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id"), expr(
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))")
      .as("qv"))

  test("matches the explode-and-group Gram on the corpus") {
    val e = quant(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    val d = 64
    // posexplode twice in one select is illegal; join two exploded frames
    val a = e.select(col("vec_id"), posexplode(col("qv")).as(Seq("i", "x")))
    val b = e.select(col("vec_id"), posexplode(col("qv")).as(Seq("j", "y")))
    val want = a.join(b, "vec_id")
      .groupBy(col("i"), col("j"))
      .agg(sum(col("x") * col("y")).as("g"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val got = e.agg(GramAgg(col("qv")).as("gs"))
      .select(posexplode(col("gs")).as(Seq("idx", "g")))
      .collect().map(r => (r.getInt(0) / d, r.getInt(0) % d) -> r.getLong(1))
      .toMap
    assert(want.nonEmpty && got == want)
  }

  test("partition-count invariant (merge order cannot matter)") {
    val e = quant(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    val results = Seq(1, 3, 7).map { n =>
      e.repartition(n).agg(GramAgg(col("qv")).as("gs"))
        .head.getSeq[Long](0)
    }
    assert(results.distinct.size == 1)
  }

  test("ragged corpus and Long overflow fail loudly") {
    val ragged = Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("qv")
      .coalesce(1)
    val e1 = intercept[SparkException] {
      ragged.agg(GramAgg(col("qv"))).collect()
    }
    assert(e1.getMessage.contains("ragged") ||
      Option(e1.getCause).exists(_.getMessage.contains("ragged")))
    val big = Seq.fill(3)(Seq(Long.MaxValue / 2)).toDF("qv").coalesce(1)
    intercept[SparkException] {
      big.agg(GramAgg(col("qv"))).collect()
    }
  }
}
