package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.LongType

/** Distributed running (inclusive) prefix sum of an integer weight under
  * a total sort order — the parallel-scan primitive (Blelloch's two-phase
  * scan) that unlocks cumulative-weight operations at corpus scale:
  * probability-proportional-to-size sampling (q123), token-budget
  * sharding ("cut the corpus every N tokens"), cumulative histograms.
  *
  * The naive formulation — `sum(w) OVER (ORDER BY ... ROWS UNBOUNDED
  * PRECEDING)` with no partitioning — collapses the dataset onto ONE
  * task, exactly like the global row_number this repo's GlobalIndex
  * replaces. Same cure, generalized from counting rows to summing a
  * weight:
  *
  *  1. range-shuffle + in-partition sort (the ONLY shuffle, executed
  *     once: both phase-2 jobs derive from one RDD instance, so the
  *     second job re-reads the shuffle files);
  *  2. one per-partition weight-total job (#partitions longs to the
  *     driver, scanned into start offsets), then a narrow map stamps
  *     `offset + running local sum` onto each row, staying on
  *     Tungsten `InternalRow`s end-to-end (no Row.fromSeq copies —
  *     the GlobalIndex r4 lesson).
  *
  * Exact-integer by construction: weights are BIGINT and the driver
  * offsets are Longs, so the stamped cumulative is bit-identical to any
  * sequential fold — which is what lets a SQL-window oracle hash-match
  * it. Overflow is a real risk at 100 TB (sum of 2^40 rows × large
  * weights): the driver folds offsets with Math.addExact, so a corpus
  * whose total outgrows 2^63 fails loudly instead of wrapping.
  *
  * Determinism caveats are GlobalIndex's verbatim: `sortCols` must be a
  * total order (end with a unique key) and non-null (engines disagree on
  * null placement). `weightCol` must be non-null BIGINT — a null weight
  * fails analysis here, not mid-task.
  */
object PrefixSum {

  /** Append `outCol`: the inclusive running sum of `weightCol` in the
    * ascending total order of `sortCols`. */
  def inclusive(df: DataFrame, sortCols: Seq[Column], weightCol: String,
      outCol: String = "cum"): DataFrame = {
    val wIdx = df.schema.fieldIndex(weightCol)
    require(df.schema(wIdx).dataType == LongType,
      s"graft PrefixSum needs BIGINT weights, got " +
        s"${df.schema(wIdx).dataType.simpleString} for '$weightCol'")
    // Two-phase machinery shared with GlobalIndex (ScanStamp): stamp
    // AFTER accumulating = inclusive cumulative. The contrib validates
    // per-row non-nullness — surfacing in the totals job, before
    // anything is stamped.
    ScanStamp(df, sortCols, outCol, stampAfter = true) { r =>
      require(!r.isNullAt(wIdx), "graft PrefixSum: null weight")
      r.getLong(wIdx)
    }
  }

  /** N inclusive running sums over ONE range shuffle — cumulative
    * histograms with several measures on a shared axis (q164's
    * two-sample CDFs). Same contract as [[inclusive]], per weight. */
  def inclusiveMulti(df: DataFrame, sortCols: Seq[Column],
      weightCols: Seq[String], outCols: Seq[String]): DataFrame = {
    require(weightCols.size == outCols.size, "weight/out arity mismatch")
    val idxs = weightCols.map { w =>
      val i = df.schema.fieldIndex(w)
      require(df.schema(i).dataType == LongType,
        s"graft PrefixSum needs BIGINT weights, got " +
          s"${df.schema(i).dataType.simpleString} for '$w'")
      i
    }.toArray
    val buf = new Array[Long](idxs.length)
    ScanStamp.multi(df, sortCols, outCols, stampAfter = true) { r =>
      var j = 0
      while (j < idxs.length) {
        require(!r.isNullAt(idxs(j)), "graft PrefixSum: null weight")
        buf(j) = r.getLong(idxs(j))
        j += 1
      }
      buf
    }
  }
}
