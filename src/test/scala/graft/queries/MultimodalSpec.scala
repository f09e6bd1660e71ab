package graft.queries

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Shape/determinism checks for the multimodal decode plumbing (the value
  * gate for q43/q44 is the DuckDB oracle; q45's decoder is imperative so
  * its contract is checked here). */
class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q45 decode: fixed-shape feature schema") {
    val df = Multimodal.specs.find(_.name == "q45_mm_decode").get.run(spark, dir)
    assert(df.schema == StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      // features ship comma-joined (driver canonicalizer can't hash arrays)
      StructField("features", StringType, nullable = true))))
    val rows = df.collect()
    assert(rows.length == 500)
    assert(rows.forall(
      _.getString(3).split(",").length == Multimodal.FakeDecoder.FeatureDim))
    assert(rows.forall { r => r.getInt(1) >= 1 && r.getInt(2) >= 1 })
  }

  test("q45 decode: deterministic across partitionings") {
    val spec = Multimodal.specs.find(_.name == "q45_mm_decode").get
    val a = spec.run(spark, dir).collect().map(_.toString)
    val b = spec.run(spark, dir).repartition(13).orderBy("doc_id")
      .collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("decoder: stripe sums match a hand computation") {
    val payload = "abcdefgh_ij".getBytes("UTF-8")
    val (w, h, feat) = Multimodal.FakeDecoder.decode(payload)
    assert(w == 1 + ('a' & 0x7f) && h == 1 + ('b' & 0x7f))
    // 11 bytes: dim0 <- bytes {0,8}, dim1 <- {1,9}, dim3 <- {3} only
    assert(feat(0) == ('a'.toInt + '_'.toInt).toDouble)
    assert(feat(1) == ('b'.toInt + 'i'.toInt).toDouble)
    assert(feat(3) == 'd'.toInt.toDouble)
  }
}
