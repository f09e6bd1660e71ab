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

  /** One-pass q136-style pre-flight audit of `key` in `facts`:
    * (n_rows, hot_n) — total rows and the hottest key's rows. Both
    * aggregate levels are map-side-partial and the result is ONE row;
    * the collect is the same bounded-driver-state contract as the
    * k-means centroid frames. */
  def audit(facts: DataFrame, key: String): (Long, Long) = {
    val r = facts.groupBy(col(key)).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")), max(col("c"))).head()
    // empty facts: the global agg emits one all-NULL row, not zero rows
    if (r.isNullAt(0)) (0L, 0L) else (r.getLong(0), r.getLong(1))
  }

  /** Salt-cell count for a measured hot-key share: enough cells that
    * the hot key's per-cell rows sink to the average reducer load
    * (hot rows h split s ways vs ideal load n/P ⇒ s >= h*P/n =
    * share*P), capped at the partition count (finer fan-out cannot
    * spread further) and floored at 1 (= no salting) when the hot key
    * would not dominate a reducer anyway. */
  def saltsFor(hotShare: Double, partitions: Int): Int = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    math.min(partitions, math.ceil(hotShare * partitions).toInt).max(1)
  }

  /** [[salted]] with the salt count DERIVED from a pre-flight audit of
    * the fact side (the q136 skew report feeding the join decision,
    * closed-loop): measures the hot key's share, sizes the salt fan-out
    * with [[saltsFor]], and skips the salt plumbing entirely (plain
    * join, no extra exchange keys, no dim replication) when the hot
    * key would not dominate a reducer. The audit is one extra
    * map-side-partial pass over the facts — the price a 100 TB join
    * pays once to avoid a straggler stage. */
  /** The salt count [[audited]] will use: audit + [[saltsFor]] under
    * the session's shuffle-partition count. Exposed so callers (and
    * the spec) can see the derived fan-out. */
  def auditedSaltCount(facts: DataFrame, key: String): Int = {
    val (nRows, hotN) = audit(facts, key)
    val p = facts.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (nRows == 0L) 1 else saltsFor(hotN.toDouble / nRows.toDouble, p)
  }

  def audited(facts: DataFrame, dim: DataFrame, key: String,
      saltBy: Column): DataFrame = {
    val salts = auditedSaltCount(facts, key)
    if (salts <= 1) {
      val d = dim.withColumnRenamed(key, "graft_dim_key")
      facts.join(d, facts(key) === d("graft_dim_key"))
        .drop("graft_dim_key")
    } else salted(facts, dim, key, salts, saltBy)
  }

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
