package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.types.{LongType, StructField}

/** Shared two-phase scan machinery behind [[GlobalIndex]] (per-row
  * contribution ≡ 1, stamp BEFORE accumulating → 0-based ordinals) and
  * [[PrefixSum]] (contribution = a weight column, stamp AFTER → inclusive
  * cumulative). One implementation so the hard-won invariants live in
  * exactly one place:
  *
  *  - the range shuffle runs ONCE: both phase-2 jobs derive from the same
  *    RDD instance, so the stamping job re-reads the totals job's shuffle
  *    files (a pure-Catalyst formulation loses this — ColumnPruning
  *    de-canonicalizes the two exchanges and ReuseExchange does not fire);
  *  - stamping never leaves Tungsten: it appends the long via a reused
  *    JoinedRow over the query's InternalRows (the Row.fromSeq copy was
  *    GlobalIndex's r4 cost — consumers copy at the scan boundary per the
  *    iterator contract);
  *  - offsets fold with Math.addExact on the driver AND per partition, so
  *    a 2^63-crossing total fails loudly instead of wrapping.
  *
  * `contrib` must be cheap, serializable, and total for the operator's
  * declared input contract (callers validate types at analysis and may
  * throw from `contrib` for per-row contract violations — that throw
  * surfaces in the totals job, before anything is stamped).
  */
private[operators] object ScanStamp {

  def apply(df: DataFrame, sortCols: Seq[Column], outCol: String,
      stampAfter: Boolean)(contrib: InternalRow => Long): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    val sorted = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)

    val rdd = sorted.queryExecution.toRdd

    // Phase-2a: per-partition contribution totals — #partitions longs to
    // the driver, scanned into start offsets.
    val totals = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => s = Math.addExact(s, contrib(r)))
      Iterator.single((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(Math.addExact)

    // Phase-2b: narrow stamping map reusing the shuffle files.
    val stamped = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      val idx = new GenericInternalRow(1)
      val joined = new JoinedRow
      it.map { r =>
        if (stampAfter) {
          acc = Math.addExact(acc, contrib(r))
          idx.setLong(0, acc)
        } else {
          idx.setLong(0, acc)
          acc = Math.addExact(acc, contrib(r))
        }
        joined(r, idx): InternalRow
      }
    }
    org.apache.spark.sql.graft.bridge.internalCreateDataFrame(spark, stamped,
      sorted.schema.add(StructField(outCol, LongType, nullable = false)))
  }
}
