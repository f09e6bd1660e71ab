package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Contiguous global ordinals (0..N-1) in a total sort order — the
  * "assign every training example a stable sequence id" step of corpus
  * prep (shard naming, curriculum ordering, resumable sharding).
  *
  * The naive formulation — `row_number() OVER (ORDER BY ...)` with no
  * partitioning — collapses the whole dataset onto ONE task and is the
  * canonical does-not-scale plan. This operator keeps the sort
  * distributed, in two phases (the `RDD.zipWithIndex` shape):
  *
  *  1. range-shuffle + in-partition sort (`repartitionByRange` +
  *     `sortWithinPartitions`) — Spark's normal distributed total sort,
  *     the ONLY shuffle here, executed ONCE: both phase-2 jobs derive
  *     from the same RDD instance, so the second job re-reads the
  *     already-written shuffle files instead of re-shuffling;
  *  2. one lightweight per-partition count job (#partitions longs to the
  *     driver, prefix-summed into start offsets), then a narrow map
  *     stamps `offset + local position` onto each row.
  *
  * The stamping never leaves Tungsten: it runs on the query's
  * `InternalRow`s (`queryExecution.toRdd`) and appends the ordinal via a
  * reused `JoinedRow`, re-entering Catalyst through
  * `internalCreateDataFrame` — no per-row `Row.fromSeq` copy in either
  * direction (that copy was this operator's r4 cost).
  *
  * Why not a pure-Catalyst formulation (per-partition count aggregate +
  * broadcast-joined offsets + monotonically_increasing_id)? Measured on
  * Spark 4.1: ColumnPruning rewrites the counts branch to carry only the
  * sort keys, the two range exchanges no longer canonicalize equal, and
  * ReuseExchange does NOT fire — the corpus gets range-shuffled twice.
  * The RDD formulation's shuffle-file reuse is guaranteed by the engine.
  *
  * Ordinals are deterministic iff `sortCols` is a total order (make the
  * last key unique, e.g. a primary key) — the same caveat any row_number
  * carries. `sortCols` must also be NON-NULL: engines disagree on null
  * placement (Spark sorts ascending NULLS FIRST, DuckDB's row_number
  * defaults NULLS LAST), so a nullable key silently diverges from a SQL
  * oracle. Range-bound sampling may place boundary rows in different
  * partitions across runs, but the stamped order — hence the ids —
  * cannot change.
  */
object GlobalIndex {

  /** Append `outCol`: the 0-based global ordinal of each row under the
    * ascending total order of `sortCols` (keys must be non-null — see
    * class doc). Two-phase machinery shared with PrefixSum (ScanStamp):
    * contribution ≡ 1, stamped BEFORE accumulating = 0-based ordinal. */
  def assign(df: DataFrame, sortCols: Seq[Column],
      outCol: String = "seq_id"): DataFrame =
    ScanStamp(df, sortCols, outCol, stampAfter = false)(_ => 1L)
}
