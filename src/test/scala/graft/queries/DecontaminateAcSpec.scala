package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q218's path auto-selection (the assignAuto doctrine applied to
  * decontamination): under the automaton cap the report comes from one
  * Aho–Corasick pass per training document; past it, from the q63-shape
  * distributed gram equi-join — and the two implementations must agree
  * ROW FOR ROW, since the oracle doesn't know which path ran. */
class DecontaminateAcSpec extends SparkSpec {
  import spark.implicits._

  private val key = graft.plans.ContainsAny.MaxPatternsKey

  private def run(dir: String): Set[(Long, Long)] =
    graft.SparkEntry.queries("q218_decontaminate_ac")(spark, dir)
      .as[(Long, Long)].collect().toSet

  test("the join fallback equals the automaton path across the cap") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val viaAc = run(dir) // default cap: automaton path
      spark.conf.set(key, "1") // force the corpus-shaped fallback
      try {
        val viaJoin = run(dir)
        assert(viaAc == viaJoin,
          s"$dir: the two q218 paths diverged " +
            s"(ac ${viaAc.size} rows vs join ${viaJoin.size})")
        assert(viaAc.nonEmpty, s"$dir: empty report - the pin is vacuous")
      } finally spark.conf.unset(key)
    }
  }
}
