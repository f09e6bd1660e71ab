package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

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
  *     the ONLY full shuffle here;
  *  2. one lightweight count job over the sorted partitions gives each
  *     partition's size; the driver prefix-sums #partitions longs (not
  *     rows) into start offsets, and a narrow map stamps
  *     `offset + local position`. No second shuffle, no single-task
  *     bottleneck; the extra pass reads back the already-shuffled
  *     partitions.
  *
  * Ordinals are deterministic iff `sortCols` is a total order (make the
  * last key unique, e.g. a primary key) — the same caveat any
  * row_number carries. Range-bound sampling may place boundary rows in
  * different partitions across runs, but the stamped order — hence the
  * ids — cannot change.
  */
object GlobalIndex {

  /** Append `outCol`: the 0-based global ordinal of each row under the
    * ascending total order of `sortCols`. */
  def assign(df: DataFrame, sortCols: Seq[Column],
      outCol: String = "seq_id"): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    val sorted = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    // Row-level zipWithIndex: phase-2 count job + narrow stamping map.
    // The Row (de)serialization boundary is the price of the RDD layer;
    // it is a straight per-row copy, and everything downstream returns
    // to Catalyst via createDataFrame.
    val stamped = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(stamped,
      sorted.schema.add(StructField(outCol, LongType, nullable = false)))
  }
}
