package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal, XxHash64}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.LongType

/** Bloom-filter membership as SQL functions — the broadcast-prefilter
  * primitive for decontamination and anti-join pruning at corpus scale.
  *
  * Spark ships [[BloomFilterAggregate]] / [[BloomFilterMightContain]] for
  * its internal runtime row-level filtering but does not expose them in
  * the public function registry; this facade registers them per session
  * (same bridge pattern as the other native graft nodes):
  *
  *  - `graft_bloom_agg(key [, expected_items])` — aggregate a LONG key
  *    column (use `xxhash64(...)` for strings) into a serialized bloom
  *    filter (BINARY). Mergeable fixed-size partials: the classic
  *    sketch shape, map-side combined, one small blob crosses the wire.
  *  - `graft_bloom_contains(bloom, key)` — membership probe. Spark
  *    requires the bloom side to be a constant or scalar subquery
  *    (it is bound once per query, not per row), so call it as
  *    `graft_bloom_contains((SELECT graft_bloom_agg(..) FROM small), k)`.
  *
  * Scale design (100 TB): a bloom of the SMALL side (e.g. the test
  * split's n-grams) is a few MB regardless of corpus size; probing the
  * BIG side is a per-row projection evaluated at the scan — contaminated
  * candidates survive, everything else never enters the shuffle. A bloom
  * has no false negatives, so `prefilter -> exact confirm join` returns
  * exactly the unfiltered join's result while moving ~zero clean rows.
  * False-positive rate is set by `expected_items` (3% at the default
  * sizing); oversizing only costs broadcast bytes, never correctness.
  */
object Blooms {

  /** Expected distinct keys when the caller gives no estimate: sized for
    * small-side sets up to ~4M keys (~4.7 MB filter at 3% fpp). */
  val DefaultExpectedItems: Long = 4L * 1000 * 1000

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, LongType) => v
    case Literal(v: Int, _)         => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Register `graft_bloom_agg` / `graft_bloom_contains` on the session
    * (idempotent — createOrReplace semantics). */
  def register(spark: SparkSession): Unit = {
    bridge.registerFunction(spark, "graft_bloom_agg", {
      case Seq(key) =>
        new BloomFilterAggregate(key, DefaultExpectedItems).toAggregateExpression()
      case Seq(key, items) =>
        new BloomFilterAggregate(key, longLit(items, "expected_items"))
          .toAggregateExpression()
      case args => throw new IllegalArgumentException(
        s"graft_bloom_agg(key[, expected_items]): got ${args.size} args")
    })
    bridge.registerFunction(spark, "graft_bloom_contains", {
      case Seq(bloom, key) => BloomFilterMightContain(bloom, key)
      case args => throw new IllegalArgumentException(
        s"graft_bloom_contains(bloom, key): got ${args.size} args")
    })
  }

  /** xxhash64 of an expression — the LONG key both functions expect for
    * string columns (exposed so Scala-side callers hash identically to
    * SQL-side `xxhash64(...)`). */
  def longKey(e: Expression): Expression = new XxHash64(Seq(e))
}
