package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** q158's adaptive band width: the integer selector and the hyperplane
  * index mapping it rides. The properties the serve path relies on:
  * b floors to SrpBits across every gate corpus (so q158's gate answer
  * equals q41's frozen-band answer), b is monotone in n and adds one
  * bit per corpus doubling (bucket occupancy stays in (target/2,
  * target]), and a table's first SrpBits hyperplanes are EXACTLY the
  * frozen q41 table's — extension bits draw from a disjoint index
  * range, so no two tables ever share a hyperplane. */
class AdaptiveBandSpec extends AnyFunSuite {
  import Similarity.{adaptiveSrpBits, srpBitIndex, SrpBandTarget,
    SrpBits, SrpBitsMax, SrpTables}

  test("b floors to SrpBits at every gate corpus size") {
    // sf0.001 = 50, sf0.01 = 500, sf0.1 = 2000 embeddings rows
    for (n <- Seq(50L, 500L, 2000L))
      assert(adaptiveSrpBits(n) == SrpBits, s"n=$n")
  }

  test("one bit per doubling past the gate regime; occupancy bounded") {
    assert(adaptiveSrpBits(SrpBandTarget << SrpBits) == SrpBits)
    assert(adaptiveSrpBits((SrpBandTarget << SrpBits) + 1) == SrpBits + 1)
    // the probe corpora
    assert(adaptiveSrpBits(20000L) == 8)
    assert(adaptiveSrpBits(200000L) == 11)
    var prev = SrpBits
    for (e <- 4 to 40) {
      val b = adaptiveSrpBits(1L << e)
      assert(b >= prev, s"b not monotone at n=2^$e")
      prev = b
      // expected occupancy n / 2^b within (target/2, target] while the
      // width hasn't saturated at SrpBitsMax
      if (b < SrpBitsMax) {
        val occ = (1L << e).toDouble / (1L << b)
        assert(occ <= SrpBandTarget, s"n=2^$e b=$b occ=$occ")
        if (b > SrpBits)
          assert(occ > SrpBandTarget / 2.0, s"n=2^$e b=$b occ=$occ")
      }
    }
    assert(adaptiveSrpBits(Long.MaxValue) == SrpBitsMax) // saturates
  }

  test("hyperplane indices: frozen prefix, disjoint across tables") {
    val frozen = (0 until SrpTables).map(t =>
      (0 until SrpBits).map(k => srpBitIndex(t, k)))
    for (t <- 0 until SrpTables; k <- 0 until SrpBits)
      assert(frozen(t)(k) == SrpBits * t + k) // q41's own hyperplanes
    val all = for {
      t <- 0 until SrpTables; k <- 0 until SrpBitsMax
    } yield srpBitIndex(t, k)
    assert(all.distinct.size == all.size, "tables share a hyperplane")
  }
}
