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

  test("q108 banding is candidate-complete: drops equal the brute-force " +
      "hamming<=3 verdicts") {
    // single-threaded ground truth: 64-bit pHash per doc from the same
    // stripes/threshold construction, then ALL pairs (no banding) at
    // hamming <= 3 -> keep-lowest-id verdicts. The banding query may
    // only ever look at band-colliding pairs; pigeonhole (4 bands,
    // t=3) says it loses none of these - this proves it on real data.
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8"))
    val hashes = docs.map { case (id, payload) =>
      val f = Multimodal.FakeDecoder.stripes(payload, 64)
      val tot = f.sum
      id -> f.indices.foldLeft(0L) { (acc, k) =>
        if (64L * f(k) > tot) acc | (1L << k) else acc
      }
    }.toMap
    val dropped = (for {
      (a, ha) <- hashes; (b, hb) <- hashes
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield b).toSet
    val got = Multimodal.specs.find(_.name == "q108_mm_phash_dedup").get
      .run(spark, dir).select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got.size == docs.length)
    assert(got.filterNot(_._2).keySet == dropped,
      s"banding drops ${got.count(!_._2)} != brute-force drops ${dropped.size}")
    // and the rendered 64-bit hash matches the reference construction
    val gotHash = Multimodal.specs.find(_.name == "q108_mm_phash_dedup").get
      .run(spark, dir).select("doc_id", "phash").collect()
      .map(r => r.getLong(0) -> java.lang.Long.parseUnsignedLong(r.getString(1), 16))
      .toMap
    assert(gotHash == hashes)
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
