package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LengthBoundedPairs (packed size|id posting lists, fused PPJoin
  * length filter) vs the reference formulation: PostingPairs over the
  * ids plus the explicit `least >= greatest * tau` size filter. */
class LengthBoundedPairsSpec extends SparkSpec {
  import spark.implicits._

  private val IdBits = LengthBoundedPairs.IdBits

  private def pack(sz: Long, id: Long): Long = (sz << IdBits) | id

  test("emits exactly the length-surviving pairs, unpacked, a < b") {
    val tau = 0.5
    // sizes 3,4,9 with ids 100,200,300: (3,4) survives (3 >= 4*0.5),
    // (3,9) and (4,9) die (size ratio below tau)
    val df = Seq((1, Seq(pack(3, 100), pack(4, 200), pack(9, 300))))
      .toDF("g", "ds")
    val got = df.select(LengthBoundedPairs(col("ds"), tau).as(Seq("a", "b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 200L)))
  }

  test("matches PostingPairs + explicit size filter on random lists") {
    val rnd = new scala.util.Random(11)
    val tau = 0.5
    val rows = (1 to 80).map { i =>
      val n = rnd.nextInt(14)
      val entries = (0 until n).map { _ =>
        (rnd.nextInt(40).toLong + 1, rnd.nextInt(100000).toLong)
      }.distinctBy(_._2)
      // packed ascending == (size, id) ascending — the call-site order
      (i, entries.map { case (sz, id) => pack(sz, id) }.sorted)
    }
    val df = rows.toDF("g", "ds").filter(size(col("ds")) >= 2)
    val fused = df
      .select(col("g"), LengthBoundedPairs(col("ds"), tau).as(Seq("a", "b")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    val reference = df
      .select(col("g"), PostingPairs(col("ds")).as(Seq("pa", "pb")))
      .select(col("g"),
        shiftrightunsigned(col("pa"), IdBits).as("na"),
        col("pa").bitwiseAND(lit((1L << IdBits) - 1)).as("a"),
        shiftrightunsigned(col("pb"), IdBits).as("nb"),
        col("pb").bitwiseAND(lit((1L << IdBits) - 1)).as("b"))
      .filter(least(col("na"), col("nb")).cast("double") >=
        greatest(col("na"), col("nb")).cast("double") * tau)
      .select(col("g"), least(col("a"), col("b")),
        greatest(col("a"), col("b")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    assert(fused.sameElements(reference))
  }
}
