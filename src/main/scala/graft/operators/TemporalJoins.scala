package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference engine lacks entirely (its only
  * binary ops are union/connect) but that every event pipeline needs:
  * as-of joins and bounded range (interval) joins. Both are built from
  * preference tier (a) of the build brief — compositions of existing
  * declarative operators — chosen so the PLANS stay scale-safe:
  *
  *  - [[asof]] is the union + keyed-window formulation: ONE shuffle on
  *    the key, no candidate-pair explosion, state per partition is a
  *    single running value. The naive formulation (equi-join then
  *    max-filter) materializes every (left, earlier-right) pair first —
  *    quadratic per key, unusable at 100 TB.
  *  - [[range]] buckets time into interval-width cells so candidates
  *    come from an equi-join on (key, bucket) — each pair is examined
  *    once (a right row lives in exactly one bucket; a left row probes
  *    each candidate bucket once), and the exact bound filters the
  *    bucket-adjacent false positives. The naive inequality join is a
  *    per-key cross product.
  */
object TemporalJoins {

  /** As-of join: for every left row, attach `rightPayload` columns from
    * the most recent right row of the same `key` with right.`ts` <=
    * left.`ts` (inclusive, ASOF-join convention); null when no such row.
    *
    * Precondition: right is unique per (key, ts) — dedup first if not,
    * or the tie is arbitrary.
    *
    * Mechanics: union both sides tagged (right=0, left=1), then
    * last(payload, ignoreNulls) over a (key)-partitioned window ordered
    * by (ts, tag) — the tag makes a right row at the exact left ts sort
    * first, implementing <=. The payload travels as ONE struct so every
    * output column comes from the SAME right row: per-column last()
    * would skip over a null field in the newest row and stitch together
    * values from different rows (and a right row whose payload fields
    * are all null would be skipped entirely). */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightPayload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq.filterNot(c => c == key || c == ts)
    val rpType = org.apache.spark.sql.types.StructType(
      rightPayload.map(p => right.schema(p)))
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as("_tag")) ++ lCols.map(col) :+
        lit(null).cast(rpType).as("_rp"): _*)
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("_tag")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightPayload.map(col): _*).as("_rp"): _*)
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .select(
        Seq(col(key), col(ts), col("_tag")) ++ lCols.map(col) :+
          last(col("_rp"), ignoreNulls = true).over(w).as("_rp"): _*)
      .filter(col("_tag") === 1)
      .select(
        Seq(col(key), col(ts)) ++ lCols.map(col) ++
          rightPayload.map(p => col("_rp").getField(p).as(p)): _*)
  }

  /** Bounded range (interval) join: every (left, right) pair sharing
    * `key` with right.`ts` in [left.`ts` + lowerUs, left.`ts` + upperUs]
    * (microsecond bounds, inclusive). Returns left's columns plus
    * `rightPayload` (caller pre-renames to avoid clashes). Inner-join
    * semantics: left rows with no partner are absent.
    *
    * Candidate generation is an equi-join on (key, time-bucket) with
    * bucket width = interval span: each left row probes the 2-3 buckets
    * its window overlaps (explode), each right row sits in exactly one,
    * so every true pair is produced exactly once and bucket-adjacent
    * misses die in the exact-bound filter. */
  def range(left: DataFrame, right: DataFrame, key: String, ts: String,
      lowerUs: Long, upperUs: Long, rightPayload: Seq[String]): DataFrame = {
    require(upperUs >= lowerUs, "upper bound below lower bound")
    val w = math.max(upperUs - lowerUs, 1L)
    def bucket(c: Column): Column = floor(c / w)
    val lUs = unix_micros(col(ts))
    val l = left
      .withColumn("_lus", lUs)
      .withColumn("_b", explode(sequence(
        bucket(lUs + lowerUs), bucket(lUs + upperUs))))
    val r = right.select(
      Seq(col(key).as("_rk"), bucket(unix_micros(col(ts))).as("_b"),
        unix_micros(col(ts)).as("_rus")) ++ rightPayload.map(col): _*)
    l.join(r, l(key) === r("_rk") && l("_b") === r("_b"))
      .filter(col("_rus") >= col("_lus") + lowerUs &&
        col("_rus") <= col("_lus") + upperUs)
      .drop("_rk", "_b", "_lus", "_rus")
  }

  /** NEAREST as-of join (the merge-asof trio's third direction, after
    * [[asof]]'s backward and the forward pass embedded here): for every
    * left row, attach `rightPayload` from the right row of the same
    * `key` whose `ts` is CLOSEST to the left's, within `toleranceUs`
    * (inclusive); ties at equal distance prefer the backward partner
    * (deterministic, documented); null payload when nothing is in
    * tolerance. Also emits `gapCol` = the chosen |Δt| in µs (null when
    * unmatched).
    *
    * Precondition: right unique per (key, ts) — dedup first.
    *
    * Mechanics: ONE union + ONE keyed sort carries BOTH directions —
    * the backward candidate is [[asof]]'s running last() over the
    * preceding frame, the forward candidate is the mirrored first()
    * over the following frame, and both window passes share the same
    * partitioning + order, so Catalyst computes them over a single
    * exchange and sort. A right row at the left's exact ts sorts into
    * the backward frame (tag order), giving it distance 0 there — which
    * is why the forward frame being exclusive at equal ts loses no
    * matches. Same scale shape as [[asof]]: no candidate-pair
    * explosion, state per partition is two running structs. */
  def nearest(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightPayload: Seq[String], toleranceUs: Long,
      gapCol: String = "gap_us"): DataFrame = {
    require(toleranceUs >= 0, "negative tolerance")
    val lCols = left.columns.toSeq.filterNot(c => c == key || c == ts)
    val rpType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("_rts",
        org.apache.spark.sql.types.LongType) +:
        rightPayload.map(p => right.schema(p)))
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as("_tag")) ++ lCols.map(col) :+
        lit(null).cast(rpType).as("_rp"): _*)
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("_tag")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(unix_micros(col(ts)).as("_rts") +: rightPayload.map(col): _*)
          .as("_rp"): _*)
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("_tag"))
    val bw = last(col("_rp"), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val fw = first(col("_rp"), ignoreNulls = true)
      .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val lus = unix_micros(col(ts))
    val bd = lus - col("_b").getField("_rts")
    val fd = col("_f").getField("_rts") - lus
    val bOk = col("_b").isNotNull && bd <= toleranceUs
    val fOk = col("_f").isNotNull && fd <= toleranceUs
    l.union(r)
      .select(
        Seq(col(key), col(ts), col("_tag")) ++ lCols.map(col) :+
          bw.as("_b") :+ fw.as("_f"): _*)
      .filter(col("_tag") === 1)
      // (true OR null) = true, (false AND null) = false — the null
      // three-valued cases a missing direction produces all resolve to
      // the intended pick here
      .withColumn("_pk",
        when(bOk && (!fOk || bd <= fd), col("_b"))
          .when(fOk, col("_f"))
          .otherwise(lit(null).cast(rpType)))
      .select(
        Seq(col(key), col(ts)) ++ lCols.map(col) ++
          rightPayload.map(p => col("_pk").getField(p).as(p)) :+
          abs(lus - col("_pk").getField("_rts")).as(gapCol): _*)
  }

  /** Interval-OVERLAP join: every (left, right) pair sharing `key` whose
    * closed intervals [lStart, lEnd] × [rStart, rEnd] intersect
    * (`lStart <= rEnd && rStart <= lEnd`; bounds are integral — epoch-µs
    * columns, already-extracted longs). Returns left's columns plus
    * `rightPayload` (caller pre-renames to avoid clashes). Inner-join
    * semantics. Distinct from [[range]]: there the right side is POINTS
    * probed by a fixed window around each left point; here BOTH sides are
    * intervals of varying width — the validity-window / in-transit /
    * observation-span shape ([[range]] is the degenerate case of
    * zero-width rights).
    *
    * Candidate generation bins the time axis at `binUs`: each interval
    * explodes to every bin it touches, candidates come from an equi-join
    * on (key, bin), and the exact predicate kills bin-sharing
    * non-overlaps. Exploding BOTH sides would emit a true pair once per
    * SHARED bin — instead of a distinct-shuffle cleanup, the emit-once
    * rule keeps a pair only in the bin containing max(lStart, rStart):
    * overlap means both intervals cover that instant, so both cover its
    * bin (exactly once each), and no other bin qualifies. Each exchange
    * carries interval endpoints + ids only (payload stays narrow by
    * caller contract); per-bucket work is |left∩bin|·|right∩bin| — the
    * bucketed-candidate bound every dedup family op in this library
    * rides, never the per-key cross product a naive inequality join
    * plans. Pick `binUs` ≈ the typical interval span: wider bins cut the
    * explode factor, narrower bins cut per-bucket products.
    *
    * The candidate join is pinned to a SORT-MERGE shuffle (`merge`
    * hint): Catalyst sizes the build side from the PRE-explode scan
    * stats, so an interval table under the broadcast threshold can
    * explode into a multi-million-row hashed relation built
    * single-threaded on the driver — measured 2.3× slower than a
    * shuffle join at sf0.1 (7.4 → 3.2 s) and strictly worse at any
    * larger scale, where overlap inputs are corpus-sized by nature.
    * Merge rather than shuffle_hash on purpose: SMJ spills, while a
    * forced SHJ's per-partition build map is memory-bound and OOMs
    * exactly when a (key, bin) cell runs hot (reproduced at the 100×
    * probe) — the hint must not trade the driver bottleneck for a
    * task-memory cliff. */
  def overlap(left: DataFrame, right: DataFrame, key: String,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binUs: Long, rightPayload: Seq[String]): DataFrame = {
    require(binUs > 0, "bin width must be positive")
    def bins(s: Column, e: Column): Column =
      sequence(floor(s / binUs), floor(e / binUs))
    val l = left.withColumn("_b", explode(bins(col(lStart), col(lEnd))))
    val r = right.select(
      Seq(col(key).as("_rk"), col(rStart).as("_rs"), col(rEnd).as("_re")) ++
        rightPayload.map(col): _*)
      .withColumn("_rb", explode(bins(col("_rs"), col("_re"))))
    l.join(r.hint("merge"), l(key) === r("_rk") && col("_b") === col("_rb"))
      .filter(col(lStart) <= col("_re") && col("_rs") <= col(lEnd) &&
        col("_b") === floor(greatest(col(lStart), col("_rs")) / binUs))
      .drop("_rk", "_b", "_rb", "_rs", "_re")
  }
}
