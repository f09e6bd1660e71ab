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
    // the buffer is reused per task — safe under multi's read-
    // immediately contract, and keeps the single-column hot path
    // allocation-free per row
    val buf = new Array[Long](1)
    multi(df, sortCols, Seq(outCol), stampAfter) { r =>
      buf(0) = contrib(r); buf
    }
  }

  /** N parallel accumulators over ONE range shuffle — the cumulative-
    * histogram shape (q164's two-sample CDFs): each row contributes a
    * vector, every component is scanned independently, and all N
    * running sums are stamped as N BIGINT columns. `contrib` may reuse
    * its returned array: both phases consume it before the next row is
    * read (fold into the totals vector / copy into the stamp row). */
  def multi(df: DataFrame, sortCols: Seq[Column], outCols: Seq[String],
      stampAfter: Boolean)(contrib: InternalRow => Array[Long]): DataFrame = {
    val n = outCols.size
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    val sorted = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)

    val rdd = sorted.queryExecution.toRdd

    // Phase-2a: per-partition contribution totals — #partitions × N
    // longs to the driver, scanned into start offsets.
    val totals = rdd.mapPartitionsWithIndex { (i, it) =>
      val s = new Array[Long](n)
      it.foreach { r =>
        val c = contrib(r)
        var j = 0
        while (j < n) { s(j) = Math.addExact(s(j), c(j)); j += 1 }
      }
      Iterator.single((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(new Array[Long](n)) { (a, t) =>
      Array.tabulate(n)(j => Math.addExact(a(j), t(j)))
    }

    // Phase-2b: narrow stamping map reusing the shuffle files.
    val stamped = rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = offsets(i).clone()
      val idx = new GenericInternalRow(n)
      val joined = new JoinedRow
      it.map { r =>
        val c = contrib(r)
        var j = 0
        while (j < n) {
          if (stampAfter) {
            acc(j) = Math.addExact(acc(j), c(j))
            idx.setLong(j, acc(j))
          } else {
            idx.setLong(j, acc(j))
            acc(j) = Math.addExact(acc(j), c(j))
          }
          j += 1
        }
        joined(r, idx): InternalRow
      }
    }
    org.apache.spark.sql.graft.bridge.internalCreateDataFrame(spark, stamped,
      outCols.foldLeft(sorted.schema)((sc, c) =>
        sc.add(StructField(c, LongType, nullable = false))))
  }
}
