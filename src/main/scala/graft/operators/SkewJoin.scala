package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions — the third leg of the
  * skew toolkit next to q48's salted aggregation and BucketingSpec's
  * co-located joins.
  *
  * A shuffle join hash-partitions both sides by the join key, so ONE hot
  * key (a dominant source/domain/language in a 100 TB corpus) lands on
  * ONE reducer and the stage runs at the speed of that straggler. AQE's
  * skew-join split handles much of this at runtime, but only for
  * sort-merge joins it can re-plan (it cannot split a partition whose
  * skew is a single key inside an aggregate-feeding exchange, and it is
  * off in streaming plans). Explicit salting is the deterministic,
  * planner-independent fix: fan each fact key across `salts` reducer
  * cells and replicate the (small-but-not-broadcastable) dimension side
  * into every cell.
  *
  * Mechanics: facts get `salt = pmod(xxhash64(saltBy), salts)` — a
  * DETERMINISTIC projection (a random salt would make runs
  * non-reproducible and oracle comparison impossible); the dimension is
  * exploded against the full 0..salts-1 range (dim is `salts`× bigger,
  * which is the explicit price of the technique — keep it for dims too
  * big to broadcast but far smaller than the facts). The join key
  * becomes (key, salt), so the exchange spreads each hot key over
  * `salts` partitions. Row-for-row identical to the plain inner join as
  * long as `dim` is unique per key (caller contract, same as
  * TemporalJoins.asof's right-side uniqueness).
  */
object SkewJoin {

  /** Inner-join `facts` to `dim` on `key`, salted `salts` ways.
    * `saltBy` is any fact column with high cardinality (a row id); the
    * salt is derived from it, not random, so results are reproducible.
    * Requires `dim` unique per `key`; output columns = facts ++ dim
    * payload (the dim's copy of `key` is dropped). */
  def salted(facts: DataFrame, dim: DataFrame, key: String, salts: Int,
      saltBy: Column): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val f = facts.withColumn("graft_salt", pmod(xxhash64(saltBy), lit(salts)))
    val d = dim
      .withColumn("graft_salt", explode(expr(s"sequence(0L, ${salts - 1}L)")))
      .withColumnRenamed(key, "graft_dim_key")
    f.join(d, f(key) === d("graft_dim_key") &&
        f("graft_salt") === d("graft_salt"))
      .drop("graft_salt").drop("graft_dim_key")
  }
}
