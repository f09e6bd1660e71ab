package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dataset profiling, approximate sketches, and sampling — the
  * inspect-before-train operators of a data pipeline.
  *
  * q50 sketches are approximate by design (HLL++ / KLL-style quantiles),
  * so the sketch VALUES carry no bit-exact oracle — instead q50 emits
  * their exact companions plus in-engine error-bound booleans, which the
  * DuckDB oracle CAN hash (exact columns + literal TRUE per bound), so
  * the sketch contract is driver-visible. q51
  * stratified sampling's coin flip is an md5 both engines compute ->
  * fully oracle-backed. q52 is exact and
  * oracle-backed.
  *
  * Scale notes: sketches are the 100 TB path for distinct counts and
  * quantiles (fixed-size state, one pass, mergeable partials — no
  * shuffle of raw values); sampleBy pushes the coin-flip into the scan
  * (no shuffle at all); the profile query is one pass of hash aggs.
  */
object Profiling {

  /** q136's audited (table, key) join edges — ONE list captured by both
    * the oracle SQL and the Spark builder, so the two sides cannot
    * drift when an edge is added or renamed. */
  private val skewEdges = Seq(
    ("lineitem", "l_partkey"), ("lineitem", "l_suppkey"),
    ("lineitem", "l_orderkey"), ("orders", "o_custkey"),
    ("events", "user_id"))

  /** Shared machinery of q143/q144: lineitem rows stamped with their
    * within-flag cumulative quantity (`cumw`) and flag total (`tw`),
    * via ONE PrefixSum range shuffle + a 3-row offset aggregate —
    * never a per-flag single-task window. One definition so the two
    * weighted-quantile queries cannot drift (the skewEdges doctrine). */
  private def flagCumQty(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val x = Tables(s, dir, "lineitem")
      .select(col("l_returnflag").as("f"),
        col("l_extendedprice").as("p"),
        col("l_quantity").cast("long").as("q"),
        col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
    val cum = graft.operators.PrefixSum.inclusive(x,
      Seq(col("f"), col("p"), col("ok"), col("ln")), "q", "cum")
    val offs = x.groupBy(col("f")).agg(sum(col("q")).as("tw"))
      .withColumn("off", coalesce(
        sum(col("tw")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("f"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)), lit(0L)))
    cum.join(broadcast(offs), "f")
      .withColumn("cumw", col("cum") - col("off"))
  }

  /** Rows of a (t, v, id) frame stamped with their within-t rank `rnw`
    * (total order (t, v, id)) and group size `n` — the weight-1
    * [[flagCumQty]] shape: ONE PrefixSum range shuffle plus a |t|-row
    * offset aggregate, never a per-group single-task window. Shared by
    * the rank-selection consumers q173/q175 (one definition, the
    * skewEdges anti-drift doctrine). */
  private def typedRank(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val x = df.withColumn("w", lit(1L))
    val cum = graft.operators.PrefixSum.inclusive(x,
      Seq(col("t"), col("v"), col("id")), "w", "cum")
    val offs = x.groupBy(col("t")).agg(sum(col("w")).as("n"))
      .withColumn("off", coalesce(
        sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("t"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)), lit(0L)))
    cum.join(broadcast(offs), "t")
      .withColumn("rnw", col("cum") - col("off"))
  }

  /** q182's allocation core, factored so WaterfillSpec can drive it with
    * adversarial synthetic supplies (the sf0.01 corpus is near-uniform
    * and never exercises the capped branch). Input: (source, supply)
    * rows, all supplies >= 0. Output: (source, supply, capped, alloc)
    * with Σalloc = 3·Σsupply div 5 exactly — see the q182 comment for
    * the prefix-property argument the single window pass rests on. */
  /** q190's packing core: greedy next-fit sequence packing of documents
    * into capacity-`cap` token bins, shard-local within
    * (source, doc_id / chunkSpan). Input columns (doc_id, source,
    * n_tok); output adds (chunk, bin_id, off), with each doc's
    * contribution capped at `cap` (an oversized doc occupies a bin
    * alone, truncated). Typed flatMapSortedGroups is the documented
    * escape hatch here: next-fit carries a reset-on-overflow fill
    * recurrence that no window function expresses (it is not a prefix
    * sum), and the chunk shard bounds that sequential state at
    * chunkSpan rows — the same shard-local contract a 100 TB packer
    * runs under (one hash exchange on (source, chunk), uniform groups,
    * no skew). The reference has no packer (its surface ends at
    * DataStream transforms, DataStream.java:131-309); this is the
    * LLM-pipeline extension — context-window packing a la T5/GPT
    * pipelines — pinned by the recursive-CTE oracle and
    * SequencePackSpec's in-memory differential. */
  private[graft] def packSeqs(docs: org.apache.spark.sql.DataFrame,
      cap: Long, chunkSpan: Long): org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id").cast("long"), col("source"),
        least(col("n_tok").cast("long"), lit(cap)).as("n_tok"))
      .as[(Long, String, Long)]
      .groupByKey { case (id, src, _) => (src, id / chunkSpan) }
      .flatMapSortedGroups(col("doc_id")) { case ((src, chunk), it) =>
        var fill = 0L
        var bin = 0L
        it.map { case (id, _, t) =>
          if (bin == 0L || fill + t > cap) { bin += 1L; fill = t }
          else fill += t
          (id, src, chunk, bin, fill - t, t)
        }
      }
      .toDF("doc_id", "source", "chunk", "bin_id", "off", "n_tok")
  }

  /** q193's packing core: BEST-FIT-DECREASING — the offline quality
    * packer beside [[packSeqs]]'s streaming-friendly next-fit. Within
    * each (source, doc_id/chunkSpan) shard, docs in (n_tok DESC,
    * doc_id) order each go to the FULLEST already-open bin that still
    * fits (ties to the lowest bin index), else open a new bin. Same
    * shard contract, same O(shard) fold; the carried state is the
    * shard's open-bin fill list (<= chunkSpan entries) instead of one
    * cursor — the price of the better utilization, and exactly why the
    * STREAMING twin pairs with next-fit, not with this. */
  private[graft] def packBestFit(docs: org.apache.spark.sql.DataFrame,
      cap: Long, chunkSpan: Long): org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id").cast("long"), col("source"),
        least(col("n_tok").cast("long"), lit(cap)).as("n_tok"))
      .as[(Long, String, Long)]
      .groupByKey { case (id, src, _) => (src, id / chunkSpan) }
      .flatMapSortedGroups(col("n_tok").desc, col("doc_id")) {
        case ((src, chunk), it) =>
          val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
          it.map { case (id, _, t) =>
            // strict > keeps the LOWEST index among equally-full bins —
            // the same tie-break the oracle's list_position(first) takes
            var best = -1
            var i = 0
            while (i < fills.length) {
              if (fills(i) + t <= cap &&
                  (best < 0 || fills(i) > fills(best))) best = i
              i += 1
            }
            val (bin, off) =
              if (best < 0) { fills += t; (fills.length.toLong, 0L) }
              else { val o = fills(best); fills(best) = o + t; (best + 1L, o) }
            (id, src, chunk, bin, off, t)
          }
      }
      .toDF("doc_id", "source", "chunk", "bin_id", "off", "n_tok")
  }

  /** The q190 greedy as DuckDB CTEs (`d` = scored docs, `pack` = the
    * recursive next-fit walk down each shard's row_number chain, depth
    * <= 64 by the shard bound). ONE definition shared by q190's
    * assignment oracle and q192's materialization oracle, so the two
    * cannot drift (the skewEdges doctrine). Callers prepend
    * `WITH RECURSIVE` and append their final SELECT. */
  private val packCtes: String =
    """d AS (
      |  SELECT doc_id, source, doc_id // 64 AS chunk,
      |    CAST(least(len(string_split(text, ' ')), 256) AS BIGINT)
      |      AS n_tok,
      |    CAST(row_number() OVER (PARTITION BY source, doc_id // 64
      |      ORDER BY doc_id) AS BIGINT) AS rn
      |  FROM documents),
      |pack AS (
      |  SELECT doc_id, source, chunk, n_tok, rn,
      |    CAST(1 AS BIGINT) AS bin_id, n_tok AS fill
      |  FROM d WHERE rn = 1
      |  UNION ALL
      |  SELECT d.doc_id, d.source, d.chunk, d.n_tok, d.rn,
      |    CASE WHEN p.fill + d.n_tok <= 256 THEN p.bin_id
      |         ELSE p.bin_id + 1 END,
      |    CASE WHEN p.fill + d.n_tok <= 256 THEN p.fill + d.n_tok
      |         ELSE d.n_tok END
      |  FROM pack p JOIN d ON d.source = p.source AND d.chunk = p.chunk
      |    AND d.rn = p.rn + 1)""".stripMargin

  /** [[packBestFit]] as DuckDB CTEs (`db` = docs in the DECREASING
    * walk order, `bfd` = the recursion carrying each shard's open-bin
    * fill LIST; the chosen bin is the first position of the max
    * eligible fill — the lowest-index tie-break). Names are disjoint
    * from [[packCtes]] so q194 can hold both in one statement. */
  private val bfdCtes: String =
    """db AS (
      |  SELECT doc_id, source, doc_id // 64 AS chunk,
      |    CAST(least(len(string_split(text, ' ')), 256) AS BIGINT)
      |      AS n_tok,
      |    CAST(row_number() OVER (PARTITION BY source, doc_id // 64
      |      ORDER BY least(len(string_split(text, ' ')), 256) DESC,
      |        doc_id) AS BIGINT) AS rn
      |  FROM documents),
      |bfd AS (
      |  SELECT doc_id, source, chunk, n_tok, rn,
      |    CAST(1 AS BIGINT) AS bin_id, CAST(0 AS BIGINT) AS off,
      |    [n_tok] AS fills
      |  FROM db WHERE rn = 1
      |  UNION ALL
      |  SELECT d.doc_id, d.source, d.chunk, d.n_tok, d.rn,
      |    CASE WHEN m IS NULL THEN len(p.fills) + 1
      |         ELSE list_position(p.fills, m) END,
      |    coalesce(m, 0),
      |    CASE WHEN m IS NULL THEN list_append(p.fills, d.n_tok)
      |         ELSE list_transform(range(1, len(p.fills) + 1),
      |           i -> CASE WHEN i = list_position(p.fills, m)
      |                THEN p.fills[i] + d.n_tok ELSE p.fills[i] END) END
      |  FROM bfd p JOIN db d ON d.source = p.source
      |    AND d.chunk = p.chunk AND d.rn = p.rn + 1,
      |  LATERAL (SELECT list_max(list_filter(p.fills,
      |      f -> f + d.n_tok <= 256)) AS m) x)""".stripMargin

  /** q182's allocation as DuckDB CTEs ending in `walloc` (source,
    * supply, capped, alloc). ONE definition shared by q182's oracle and
    * q195's quota join (the packCtes/bfdCtes doctrine). */
  private val waterfillCtes: String =
    """s AS (SELECT source,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS supply
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(3 * sum(supply) // 5 AS BIGINT) AS budget,
      |        CAST(count(*) AS BIGINT) AS n FROM s),
      |o AS (SELECT source, supply,
      |    CAST(row_number() OVER (ORDER BY supply, source) AS BIGINT)
      |      AS rn,
      |    CAST(sum(supply) OVER (ORDER BY supply, source
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM s),
      |c AS (SELECT o.*, budget, n,
      |    CASE WHEN supply * (n - rn + 1) <= budget - (cum - supply)
      |         THEN 1 ELSE 0 END AS capped FROM o, t),
      |k AS (SELECT CAST(coalesce(sum(capped), 0) AS BIGINT) AS nc,
      |    CAST(coalesce(sum(CASE WHEN capped = 1 THEN supply END), 0)
      |      AS BIGINT) AS cumc FROM c),
      |walloc AS (SELECT source, supply, capped = 1 AS capped,
      |  CAST(CASE WHEN capped = 1 THEN supply
      |    ELSE (budget - cumc) // (n - nc)
      |      + (CASE WHEN rn - nc <= (budget - cumc) % (n - nc)
      |              THEN 1 ELSE 0 END) END AS BIGINT) AS alloc
      |  FROM c, k)""".stripMargin

  private[queries] def waterfill(sup: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = sup.agg(expr("3 * sum(supply) div 5").as("budget"),
      count(lit(1)).as("n"))
    val w = Window.orderBy(col("supply"), col("source"))
    val o = sup.select(col("source"), col("supply"),
      row_number().over(w).cast("long").as("rn"),
      sum(col("supply")).over(w).as("cum"))
    val c = o.crossJoin(broadcast(tot))
      .withColumn("capped",
        when(col("supply") * (col("n") - col("rn") + 1)
          <= col("budget") - (col("cum") - col("supply")), 1L)
          .otherwise(0L))
    val k = c.agg(coalesce(sum(col("capped")), lit(0L)).as("nc"),
      coalesce(sum(when(col("capped") === 1, col("supply"))), lit(0L))
        .as("cumc"))
    c.crossJoin(broadcast(k))
      .select(col("source"), col("supply"),
        (col("capped") === 1).as("capped"),
        when(col("capped") === 1, col("supply"))
          .otherwise(expr("(budget - cumc) div (n - nc)")
            + when(col("rn") - col("nc")
                <= (col("budget") - col("cumc")) % (col("n") - col("nc")),
                1L).otherwise(0L))
          .as("alloc"))
  }

  val specs: Seq[QuerySpec] = Seq(

    // ------------------------------------------------------------------
    // Approximate sketches per return flag: HLL++ distinct orders and
    // KLL-style quantile estimates over the price distribution. The
    // sketch values themselves are approximate by design, so no engine-
    // independent oracle can hash them — instead the query emits the
    // EXACT companions (distinct count, row count) plus in-engine
    // booleans proving each sketch landed inside its published error
    // bound: |HLL − exact| ≤ 6% (3σ at rsd 0.02) and the approx
    // percentiles' true ranks within n/1000 + slack of their targets
    // (10× the accuracy-10000 guarantee, headroom for price ties). The
    // oracle predicts the exact columns and literal TRUE for each bound
    // — if a sketch ever drifts outside its contract the boolean flips
    // and the driver gate goes red. Scale: the sketches and exact
    // companions ride ONE grouped aggregate (fixed-size mergeable
    // state); the rank check joins the 3-row sketch frame back
    // broadcast, so the second pass is scan + map-side partials only.
    QuerySpec.sqlBacked("q50_approx_sketch",
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |  CAST(count(*) AS BIGINT) AS n,
        |  TRUE AS hll_ok, TRUE AS q50_ok, TRUE AS q95_ok
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"),
          col("l_extendedprice"))
      val sk = li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
          percentile_approx(col("l_extendedprice"),
            array(lit(0.5), lit(0.95)), lit(10000)).as("pq"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          count(lit(1)).as("n"))
      val ranks = li
        .join(broadcast(sk.select(col("l_returnflag"), col("pq"))),
          "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("l_extendedprice") <= element_at(col("pq"), 1), 1L)
            .otherwise(0L)).as("r50"),
          sum(when(col("l_extendedprice") <= element_at(col("pq"), 2), 1L)
            .otherwise(0L)).as("r95"))
      sk.join(ranks, "l_returnflag")
        .select(col("l_returnflag"), col("exact_orders"), col("n"),
          (abs(col("approx_orders") - col("exact_orders")) * 100 <=
            col("exact_orders") * 6).as("hll_ok"),
          (abs(col("r50") * 2 - col("n")) * 500 <=
            col("n") + 1000).as("q50_ok"),
          (abs(col("r95") * 20 - col("n") * 19) * 50 <=
            col("n") + 1000).as("q95_ok"))
        .orderBy(col("l_returnflag"))
    },

    // ------------------------------------------------------------------
    // Deterministic stratified sampling by return flag: ~20%/50%/80% per
    // stratum — the class-balancing primitive for training-set
    // construction. The coin flip is md5(row key) mapped to a 16-bit
    // uniform and compared to a per-stratum integer threshold, so the
    // sample depends only on the row's identity: stable across reruns,
    // partitionings, AND engines (unlike `sampleBy`'s seeded RNG, which
    // is Spark-internal and oracle-uncheckable). Pure projection — the
    // flip runs inside the scan, no shuffle before the tiny count agg.
    // The 16-bit uniform is parsed from the hash's first 4 hex chars in
    // ONE expression (Spark conv / DuckDB 0x-cast): a nibble-by-nibble
    // sum would reference the md5 alias 4 times, and CollapseProject
    // inlines aliases — recomputing the md5 per reference (measured 4x).
    QuerySpec.sqlBacked("q51_sample_stratified",
      """SELECT l_returnflag, count(*) AS n_sampled
        |FROM (
        |  SELECT l_returnflag,
        |    CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
        |          CAST(l_linenumber AS VARCHAR)), 1, 4)) AS INTEGER) AS u
        |  FROM lineitem)
        |WHERE u < CASE l_returnflag WHEN 'A' THEN 13107
        |                            WHEN 'N' THEN 32768 ELSE 52428 END
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_returnflag"),
          conv(substring(md5(concat(col("l_orderkey").cast("string"),
            lit(":"), col("l_linenumber").cast("string"))), 1, 4), 16, 10)
            .cast("int").as("u"))
        .filter(col("u") <
          when(col("l_returnflag") === "A", 13107)
            .when(col("l_returnflag") === "N", 32768).otherwise(52428))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy(col("l_returnflag"))
    },

    // ------------------------------------------------------------------
    // Exact single-pass data profile of lineitem's core columns.
    QuerySpec.sqlBacked("q52_profile",
      """SELECT count(*) AS n_rows,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_flags,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
        |FROM lineitem""".stripMargin) { (s, dir) =>
      import graft.functions.Cols
      // The distinct counts run as their OWN aggregate, cross-joined
      // (1 row × 1 row) with the plain profile: mixing count(DISTINCT)
      // into the same Aggregate makes Catalyst Expand every input row
      // 3× carrying all five profiled columns through the blowup —
      // measured 1.8 s vs 0.7 s for the two independent scans at sf0.1.
      // Two column-pruned parallel scans also beat one 3×-expanded pass
      // at 100 TB (each reads only its own columns).
      val t = Tables(s, dir, "lineitem")
      val basic = t.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_returnflag").isNull, 1).otherwise(0)).as("null_flags"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        Cols.toD(sum(Cols.m2(col("l_quantity")))).as("sum_qty"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))
      val dd = t.agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"))
      basic.crossJoin(dd).select(
        col("n_rows"), col("n_orders"), col("n_parts"), col("null_flags"),
        col("min_qty"), col("max_qty"), col("sum_qty"),
        col("first_ship"), col("last_ship"))
    },

    // ------------------------------------------------------------------
    // Deterministic hash-based train/val/test split (~80/10/10): the
    // assignment depends only on doc_id (stable across reruns, engines,
    // partitionings — what leakage-free splits require), via md5's first
    // nibble: 0-12 -> train, 13 -> val, 14-15 -> test. Pure projection.
    QuerySpec.sqlBacked("q56_train_test_split",
      """SELECT split, count(*) AS n, min(doc_id) AS first_id
        |FROM (SELECT doc_id,
        |        CASE WHEN nib <= 12 THEN 'train'
        |             WHEN nib = 13 THEN 'val' ELSE 'test' END AS split
        |      FROM (SELECT doc_id,
        |              strpos('0123456789abcdef',
        |                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
        |                AS nib
        |            FROM documents))
        |GROUP BY split ORDER BY split""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          (instr(lit("0123456789abcdef"),
            substring(md5(col("doc_id").cast("string")), 1, 1)) - 1).as("nib"))
        .select(col("doc_id"),
          when(col("nib") <= 12, "train")
            .when(col("nib") === 13, "val")
            .otherwise("test").as("split"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_id"))
        .orderBy(col("split"))
    },

    // ------------------------------------------------------------------
    // Fixed-size per-stratum sample: EXACTLY min(5, |stratum|) docs per
    // (source, lang), chosen uniformly yet reproducibly — order every
    // stratum by a per-doc hash (descending: TopKAgg is a max-heap,
    // keeping the k LARGEST as q64 does) and take the first 5. q51
    // samples a RATE (binomial sizes); eval sets and ablations need
    // exact counts. Executed with the bounded-heap
    // [[graft.plans.TopKAgg]]: at most k rows per stratum cross the
    // shuffle, vs a ranking window's full per-stratum sort — same scale
    // shape as q64.
    QuerySpec.sqlBacked("q78_sample_fixed_k",
      """SELECT source, lang, rk, doc_id FROM (
        |  SELECT source, lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source, lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)) DESC, doc_id DESC
        |      ) AS BIGINT) AS rk
        |  FROM documents)
        |WHERE rk <= 5 ORDER BY source, lang, rk""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("source"), col("lang"), col("doc_id"),
          md5(col("doc_id").cast("string")).as("h"))
        .groupBy(col("source"), col("lang"))
        .agg(graft.plans.TopKAgg(
          struct(col("h"), col("doc_id").as("id")), 5).as("top"))
        .select(col("source"), col("lang"),
          posexplode(col("top")).as(Seq("i", "t")))
        .select(col("source"), col("lang"),
          (col("i") + 1).cast("long").as("rk"), col("t.id").as("doc_id"))
        .orderBy(col("source"), col("lang"), col("rk"))
    },

    // ------------------------------------------------------------------
    // Corpus mixing with oversampling: each source gets a mixing rate
    // (high-quality sources ABOVE 1.0 — repeated across epochs — low
    // ones below), and every doc is emitted floor(rate) times plus one
    // more with probability frac(rate), decided by the same md5-uniform
    // as q51 so the materialized mixture is reproducible. Pure
    // projection + explode(sequence(...)): no shuffle, no driver
    // randomness; the emitted epoch index feeds downstream shuffling.
    QuerySpec.sqlBacked("q79_corpus_mix",
      """SELECT source, count(*) AS n_emitted,
        |       count(DISTINCT doc_id) AS n_docs
        |FROM (
        |  SELECT source, doc_id, unnest(range(0,
        |    CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 1 ELSE 0 END
        |    + CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
        |                      1, 4)) AS INTEGER)
        |        < CASE source WHEN 'src0' THEN 32768
        |                      WHEN 'src1' THEN 16384 ELSE 13107 END
        |      THEN 1 ELSE 0 END)) AS epoch
        |  FROM documents)
        |GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      // rates: src0 2.5x, src1 1.25x, others 0.2x (16-bit thresholds
      // 32768/16384/13107 = .5/.25/.2 fractional parts)
      val copies =
        when(col("source") === "src0", 2)
          .when(col("source") === "src1", 1).otherwise(0) +
        when(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("int") <
          when(col("source") === "src0", 32768)
            .when(col("source") === "src1", 16384).otherwise(13107), 1)
          .otherwise(0)
      Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"), copies.as("nc"))
        // nc = 0 must vanish; Spark's sequence(0, -1) yields a
        // DESCENDING [0,-1] (DuckDB's range(0,0) is empty), so guard
        // before exploding rather than relying on an empty sequence
        .filter(col("nc") > 0)
        .select(col("source"), col("doc_id"),
          explode(sequence(lit(0), col("nc") - 1)).as("epoch"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_emitted"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("source"))
    },

    // ------------------------------------------------------------------
    // Exact per-group percentiles (p50/p95/p99 of event value by type):
    // the tail-latency / outlier profile. Spark's `percentile` is the
    // EXACT linear-interpolated quantile (DuckDB twin: quantile_cont) —
    // right when group cardinality is bounded (5 event types here; the
    // per-group sort is the cost). For unbounded groups or
    // whole-dataset quantiles at 100 TB, q50's approx_percentile
    // (fixed-state mergeable sketch) is the scale path — this is the
    // exact complement, same pairing as q40 (exact) vs q41/q42 (LSH).
    QuerySpec.sqlBacked("q82_exact_percentiles",
      """SELECT event_type, count(*) AS n,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.95) AS p95,
        |  quantile_cont(value, 0.99) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          percentile(col("value"), lit(0.5)).as("p50"),
          percentile(col("value"), lit(0.95)).as("p95"),
          percentile(col("value"), lit(0.99)).as("p99"))
        .orderBy(col("event_type"))
    },

    // ------------------------------------------------------------------
    // Identifier pseudonymization — the governance step before training
    // data leaves its enclave: user ids replaced by salted SHA-256
    // digests (stable across engines/partitions/reruns so joins still
    // line up, irreversible without the salt), here aggregating the
    // event stream per pseudonym. Pure projection + one count aggregate
    // keyed by the digest (uniform spread, no skew).
    QuerySpec.sqlBacked("q85_pseudonymize",
      """SELECT sha256('graft-salt:' || CAST(user_id AS VARCHAR)) AS uid,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS cents
        |FROM events GROUP BY uid ORDER BY uid""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .select(sha2(concat(lit("graft-salt:"),
            col("user_id").cast("string")), 256).as("uid"),
          // floor(x+0.5), the q60 idiom: CAST(double AS BIGINT) rounds
          // in DuckDB but truncates in Spark — floor first is exact in
          // both (2-decimal inputs, 654.999... vs 655 class of drift)
          floor(col("value") * 100 + 0.5).cast("long").as("v"))
        .groupBy(col("uid"))
        .agg(count(lit(1)).as("n_events"), sum(col("v")).as("cents"))
        .orderBy(col("uid"))
    },

    // ------------------------------------------------------------------
    // Temperature rebalancing plan (alpha = 0.5): the mixture-design
    // step before q79's emission — per source, the upsample factor
    // sqrt(n_max/n) that flattens the source distribution toward
    // uniform (the multilingual/multi-source temperature-sampling rule,
    // alpha=0.5 so the exponent is a single IEEE-correctly-rounded
    // sqrt; an arbitrary alpha would hinge on libm pow parity between
    // engines, sqrt doesn't). Every value is a short composition of
    // correctly-rounded ops on exact integer counts — engine-identical.
    // Scale: one count-by-source aggregate (map-side partials), the max
    // and the two totals are one-row broadcasts — the corpus is scanned
    // once and only |sources| rows ever move.
    QuerySpec.sqlBacked("q99_temperature_mix",
      """WITH c AS (SELECT source, count(*) AS n FROM documents
        |           GROUP BY source),
        |m AS (SELECT max(n) AS n_max, CAST(sum(n) AS BIGINT) AS total
        |      FROM c),
        |e AS (SELECT source, n, total,
        |        sqrt(CAST(n_max AS DOUBLE) / n) AS rate,
        |        CAST(floor(n * sqrt(CAST(n_max AS DOUBLE) / n)) AS BIGINT)
        |          AS n_emit
        |      FROM c, m),
        |t AS (SELECT CAST(sum(n_emit) AS BIGINT) AS emit_total FROM e)
        |SELECT source, n, CAST(n AS DOUBLE) / total AS share_before,
        |       rate, n_emit,
        |       CAST(n_emit AS DOUBLE) / emit_total AS share_after
        |FROM e, t ORDER BY source""".stripMargin) { (s, dir) =>
      // scratch-cache the per-source counts: m, e and t all consume
      // them, and left lazy each would re-run the corpus scan
      val c = Tables(s, dir, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
      Dedup.withScratch(c) {
        val m = c.agg(max(col("n")).as("n_max"), sum(col("n")).as("total"))
        val rate = sqrt(col("n_max").cast("double") / col("n"))
        val e = c.crossJoin(broadcast(m))
          .select(col("source"), col("n"), col("total"), rate.as("rate"),
            floor(col("n") * rate).cast("long").as("n_emit"))
        val t = e.agg(sum(col("n_emit")).as("emit_total"))
        e.crossJoin(broadcast(t))
          .select(col("source"), col("n"),
            (col("n").cast("double") / col("total")).as("share_before"),
            col("rate"), col("n_emit"),
            (col("n_emit").cast("double") / col("emit_total"))
              .as("share_after"))
          .orderBy(col("source"))
      }
    },

    // ------------------------------------------------------------------
    // PII scrubbing — q85's sibling for identifiers INSIDE text: regex
    // detection + replacement of emails/phone numbers, the redaction
    // pass training text goes through before leaving its enclave. The
    // synthetic corpus contains no PII by construction, so both engines
    // first inject deterministic doc_id-derived instances into the text
    // and then scrub them — what the oracle pins is the SCRUBBER's
    // cross-engine exactness (patterns restricted to the RE2 ∩
    // java.util.regex common subset: character classes, bounded repeats,
    // no lookaround; leftmost-first greedy in both). md5 of the full
    // scrubbed text is the hash signal, so a single character of drift
    // fails loudly. Pure projection: regexes run inside the scan
    // (codegen'd), no shuffle, the 100 TB cost is the scan itself.
    QuerySpec.sqlBacked("q101_pii_scrub", {
      val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phone = "\\+1-[0-9]{3}-[0-9]{4}"
      s"""WITH inj AS (
         |  SELECT doc_id,
         |    text || ' contact user' || CAST(doc_id AS VARCHAR)
         |         || '@example.org or +1-'
         |         || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
         |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |         || ' today' AS t
         |  FROM documents),
         |s AS (SELECT doc_id,
         |        CAST(len(regexp_extract_all(t, '$email')) AS INTEGER)
         |          AS n_email,
         |        CAST(len(regexp_extract_all(t, '$phone')) AS INTEGER)
         |          AS n_phone,
         |        regexp_replace(regexp_replace(t, '$email', '<EMAIL>', 'g'),
         |          '$phone', '<PHONE>', 'g') AS scrubbed
         |      FROM inj)
         |SELECT doc_id, n_email, n_phone,
         |       CAST(length(scrubbed) AS INTEGER) AS scrubbed_len,
         |       md5(scrubbed) AS scrub_fp
         |FROM s ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phone = "\\+1-[0-9]{3}-[0-9]{4}"
      val inj = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.org or +1-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" today"))
      val scrubbed = regexp_replace(
        regexp_replace(col("t"), lit(email), lit("<EMAIL>")),
        lit(phone), lit("<PHONE>"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), inj.as("t"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(email), lit(0)))
            .as("n_email"),
          size(regexp_extract_all(col("t"), lit(phone), lit(0)))
            .as("n_phone"),
          scrubbed.as("scrubbed"))
        .select(col("doc_id"), col("n_email"), col("n_phone"),
          length(col("scrubbed")).as("scrubbed_len"),
          md5(col("scrubbed")).as("scrub_fp"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // Heavy hitters, sketch-then-confirm: tokens appearing in >= 2% of
    // the corpus stream, found WITHOUT a vocabulary-sized shuffle. Pass 1
    // is one Misra-Gries aggregate ([[graft.plans.HeavyHitters]],
    // capacity 63): fixed-state mergeable partials whose candidate set
    // provably contains every token above N/64 of the stream — 2% = 1/50
    // >= 1/64, so the superset guarantee covers the threshold. Pass 2
    // broadcasts the <= 63 candidates back over the token stream
    // (semi-join inside the scan) and exact-counts ONLY them, then
    // thresholds by integer cross-multiplication. The confirmed output is
    // exactly "tokens with cnt*50 >= total" — deterministic even though
    // the raw candidate set is merge-order-dependent — which is what
    // makes an approximate-sketch pipeline DuckDB-oracle-able at all
    // (the q98 doctrine: exactness at the output, approximation inside).
    // Scale: both exchanges carry <= capacity keys of partials; the full
    // group-count this replaces shuffles the whole vocabulary.
    QuerySpec.sqlBacked("q115_heavy_hitters",
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM toks),
        |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        |      FROM toks GROUP BY tok)
        |SELECT tok, cnt, total, CAST(cnt AS DOUBLE) / total AS share
        |FROM c, tot WHERE cnt * 50 >= total ORDER BY tok""".stripMargin) {
      (s, dir) =>
      val toks = Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
      // ONE row: total stream count + the MG candidate superset. Scratch-
      // cached because both the candidate explode and the total consume
      // it — left lazy each would re-run the sketch's corpus scan.
      val sk = toks.agg(graft.plans.HeavyHitters(col("tok"), 63).as("sk"))
      Dedup.withScratch(sk) {
        val cand = sk.select(explode(col("sk.cand")).as("tok"))
        val tot = sk.select(col("sk.total").as("total"))
        toks.join(broadcast(cand), "tok")
          .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(tot))
          .filter(col("cnt") * 50 >= col("total"))
          .select(col("tok"), col("cnt"), col("total"),
            (col("cnt").cast("double") / col("total")).as("share"))
          .orderBy(col("tok"))
      }
    },

    // ------------------------------------------------------------------
    // q115's grouped form — heavy hitters PER SOURCE (the per-language/
    // per-domain hot-token report a curation pipeline actually runs):
    // one MG summary per group (each group owns its fixed-size buffer,
    // so the sketch exchange carries |groups| × capacity state, still
    // never a vocabulary), confirm = exact count of only the broadcast
    // (source, candidate) pairs, threshold 2% of EACH source's stream.
    // Same exactness argument as q115, applied group-wise.
    QuerySpec.sqlBacked("q118_heavy_hitters_by_source",
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS total
        |        FROM toks GROUP BY source),
        |c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
        |      FROM toks GROUP BY source, tok)
        |SELECT c.source, tok, cnt, total
        |FROM c JOIN tot ON c.source = tot.source
        |WHERE cnt * 50 >= total ORDER BY c.source, tok""".stripMargin) {
      (s, dir) =>
      val toks = Tables(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      val sk = toks.groupBy(col("source"))
        .agg(graft.plans.HeavyHitters(col("tok"), 63).as("sk"))
      Dedup.withScratch(sk) {
        val cand = sk.select(col("source"), explode(col("sk.cand")).as("tok"))
        val tot = sk.select(col("source"), col("sk.total").as("total"))
        toks.join(broadcast(cand), Seq("source", "tok"))
          .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
          .join(broadcast(tot), Seq("source"))
          .filter(col("cnt") * 50 >= col("total"))
          .select(col("source"), col("tok"), col("cnt"), col("total"))
          .orderBy(col("source"), col("tok"))
      }
    },

    // ------------------------------------------------------------------
    // Probability-proportional-to-size systematic sample (classic PPS /
    // cumulative-size sampling, Madow 1949): lay the docs end-to-end on
    // the cumulative n_chars axis, cut every `stride = total/k` chars,
    // keep each doc whose span crosses a cut — selection probability
    // proportional to byte weight, the shape used to draw a
    // size-debiased eval slice from a training corpus. Two properties
    // make it the SCALE form of weighted sampling: (a) it is exact
    // integer arithmetic end-to-end (Efraimidis-Spirakis keys need
    // pow/log, whose libm rounding diverges across engines — same
    // doctrine as q98/q113), and (b) the cumulative weight comes from
    // operators.PrefixSum — Blelloch two-phase scan, ONE range shuffle,
    // #partitions longs on the driver — where the textbook
    // `sum() OVER (ORDER BY ...)` with no partition collapses 100 TB
    // onto one task (the oracle below runs exactly that form, which
    // DuckDB can afford at test SF).
    QuerySpec.sqlBacked("q123_pps_sample",
      """WITH w AS (SELECT doc_id, source, n_chars,
        |    CAST(sum(n_chars) OVER (ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM documents),
        |s AS (SELECT CAST(CAST(sum(n_chars) AS BIGINT) // 40 AS BIGINT)
        |        AS stride FROM documents)
        |SELECT doc_id, source, n_chars, cum
        |FROM w, s
        |WHERE cum // stride > (cum - n_chars) // stride
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val cum = graft.operators.PrefixSum
        .inclusive(docs, Seq(col("doc_id")), "n_chars", "cum")
      // integer div (not `/`, which is double division and would round
      // for totals beyond 2^53). Fail-loud on stride=0 (total < k):
      // Spark's div-by-zero yields NULL, which would silently return an
      // EMPTY sample where DuckDB errors — the PrefixSum overflow-guard
      // doctrine applied to the degenerate-corpus case.
      val stride = docs
        .agg(expr("CAST(sum(n_chars) AS BIGINT) div 40").as("stride"))
        .select(expr("IF(stride > 0, stride, " +
          "raise_error('graft q123: total weight below k; stride is 0'))")
          .as("stride"))
      cum.crossJoin(broadcast(stride))
        // non-negative longs: integer div is floor in both engines
        .filter(expr("cum div stride > (cum - n_chars) div stride"))
        .select(col("doc_id"), col("source"), col("n_chars"), col("cum"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // Token-budget sharding — PrefixSum's second consumer: cut the
    // corpus into CONTIGUOUS shards of ~100k chars each (a doc belongs
    // to the shard its cumulative start falls in; docs never split) —
    // the "write the training corpus as resumable, size-bounded shards
    // in a stable global order" step of corpus prep, where a dataloader
    // needs shard N addressable without scanning shards 0..N-1. Same
    // scale argument as q123: the cumulative axis is ONE range shuffle,
    // and the shard assignment is integer arithmetic on the stamped
    // value — where the oracle's window formulation serializes the
    // corpus through a single task.
    QuerySpec.sqlBacked("q125_token_shards",
      """WITH w AS (SELECT doc_id, n_chars,
        |    CAST(sum(n_chars) OVER (ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM documents)
        |SELECT CAST((cum - n_chars) // 100000 AS BIGINT) AS shard_id,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS chars,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM w GROUP BY shard_id ORDER BY shard_id""".stripMargin) {
      (s, dir) =>
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      graft.operators.PrefixSum
        .inclusive(docs, Seq(col("doc_id")), "n_chars", "cum")
        .select(col("doc_id"), col("n_chars"),
          expr("(cum - n_chars) div 100000").as("shard_id"))
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard_id"))
    },

    // ------------------------------------------------------------------
    // q223: RENDEZVOUS (highest-random-weight) sharding — the
    // consistent-hash answer to "we added a shard; what moves?".
    // q125's cumulative-cut shards renumber almost every boundary when
    // the shard size changes; rendezvous hashing (Thaler & Ravishankar
    // 1998) assigns each doc to argmax over shards of
    // md5(doc_id:shard), so going k=8 → k=9 moves ONLY the docs whose
    // new shard 8 wins — in expectation n/9, and never shard-to-shard
    // among the original 8. The report proves that property from the
    // data: per shard, population under both k and arrivals under the
    // re-shard (n_moved_in = 0 for shards 0–7 BY CONSTRUCTION — any
    // nonzero row is a broken-hash alarm). Ties in the hex hash are
    // broken toward the lowest shard id (max(h), then min(i)) — an
    // md5-collision-only case, pinned anyway so both engines state the
    // same total order. Scale: the ×k hash explode is a stateless
    // projection (k is a constant, 9 rows per doc), the argmax is ONE
    // map-side-combining max(struct) per (doc, k) — no window, no
    // shuffle beyond the doc-keyed aggregate — and the report is k
    // rows. At 100 TB this is exactly the re-shard planner you run
    // BEFORE moving bytes: the movement set falls out as a filter.
    QuerySpec.sqlBacked("q223_rendezvous_shards",
      """WITH e AS (SELECT doc_id, i,
        |    md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)) AS h
        |  FROM documents, unnest(range(0, 9)) AS t(i)),
        |a9 AS (SELECT doc_id, i AS s9 FROM (
        |    SELECT doc_id, i, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY h DESC, i) AS rn FROM e) WHERE rn = 1),
        |a8 AS (SELECT doc_id, i AS s8 FROM (
        |    SELECT doc_id, i, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY h DESC, i) AS rn FROM e WHERE i < 8) WHERE rn = 1),
        |j AS (SELECT a8.doc_id, s8, s9 FROM a8 JOIN a9 USING (doc_id)),
        |c8 AS (SELECT s8 AS shard, CAST(count(*) AS BIGINT) AS n_k8
        |       FROM j GROUP BY s8),
        |c9 AS (SELECT s9 AS shard, CAST(count(*) AS BIGINT) AS n_k9,
        |         CAST(sum(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_moved_in
        |       FROM j GROUP BY s9)
        |SELECT coalesce(c9.shard, c8.shard) AS shard,
        |       coalesce(n_k8, CAST(0 AS BIGINT)) AS n_k8,
        |       coalesce(n_k9, CAST(0 AS BIGINT)) AS n_k9,
        |       coalesce(n_moved_in, CAST(0 AS BIGINT)) AS n_moved_in
        |FROM c9 FULL JOIN c8 USING (shard)
        |ORDER BY shard""".stripMargin) { (s, dir) =>
      val hh = Tables.spread(s, dir, "documents")
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, 8), i -> struct(
            | md5(concat(CAST(doc_id AS STRING), ':', CAST(i AS STRING))) AS h,
            | CAST(i AS BIGINT) AS i))""".stripMargin.replace("\n", "")))
          .as("e"))
        .select(col("doc_id"), col("e.h").as("h"), col("e.i").as("i"))
      // argmax by (h DESC, i ASC) via max(struct(h, -i)): max hex hash,
      // tie toward the lowest shard id — one combining aggregate, the
      // oracle's row_number without its window
      def assign(in: org.apache.spark.sql.DataFrame, out: String) = in
        .groupBy(col("doc_id"))
        .agg(max(struct(col("h"), (-col("i")).as("ni"))).as("m"))
        .select(col("doc_id"), (-col("m.ni")).as(out))
      val j = assign(hh.filter(col("i") < 8), "s8")
        .join(assign(hh, "s9"), "doc_id")
        .localCheckpoint() // two grouped consumers (c8 + c9)
      val c8 = j.groupBy(col("s8").as("shard"))
        .agg(count(lit(1)).as("n_k8"))
      val c9 = j.groupBy(col("s9").as("shard"))
        .agg(count(lit(1)).as("n_k9"),
          sum(when(col("s8") =!= col("s9"), 1L).otherwise(0L))
            .as("n_moved_in"))
      c9.join(c8, Seq("shard"), "full")
        .select(col("shard"),
          coalesce(col("n_k8"), lit(0L)).as("n_k8"),
          coalesce(col("n_k9"), lit(0L)).as("n_k9"),
          coalesce(col("n_moved_in"), lit(0L)).as("n_moved_in"))
        .orderBy(col("shard"))
    },

    // ------------------------------------------------------------------
    // Equi-depth (decile) binning of a numeric column — feature
    // discretization with EXACT ntile semantics, without ntile's plan:
    // `ntile(b) OVER (ORDER BY ...)` with no partition (the oracle's
    // form) serializes the fact table through ONE task, the same
    // degenerate window GlobalIndex exists to kill. Here the global
    // rank comes from GlobalIndex (one range shuffle, distributed
    // sort), and ntile's allocation rule — first n%b bins get
    // ceil(n/b) rows — is integer arithmetic on the stamped ordinal
    // (n arrives as a broadcast 1-row count, the q123 stride shape).
    // Ties in l_extendedprice are broken by (orderkey, linenumber);
    // rows identical in ALL THREE are interchangeable for every output
    // aggregate, so the result is engine-deterministic even though
    // the generated lineitem is not key-unique.
    QuerySpec.sqlBacked("q127_equidepth_bins",
      """WITH r AS (SELECT l_extendedprice AS p,
        |    CAST(ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey,
        |      l_linenumber) AS BIGINT) AS bin
        |  FROM lineitem)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |       min(p) AS min_price, max(p) AS max_price,
        |       CAST(sum(CAST(p AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM r GROUP BY bin ORDER BY bin""".stripMargin) { (s, dir) =>
      import graft.functions.Cols.{m2, toD}
      val b = 10
      val li = Tables(s, dir, "lineitem")
        .select(col("l_extendedprice").as("p"), col("l_orderkey"),
          col("l_linenumber"))
      val ranked = graft.operators.GlobalIndex.assign(li,
        Seq(col("p"), col("l_orderkey"), col("l_linenumber")), "rk")
      val cnt = li.agg(count(lit(1)).as("total"))
      ranked.crossJoin(broadcast(cnt))
        // ntile allocation: q = total div b bins of size q+1 for the
        // first rem = total mod b bins, size q after; 0-based rk
        .withColumn("bin",
          when(col("rk") < (col("total") % b) * (expr(s"total div $b") + 1),
            expr(s"rk div (total div $b + 1)"))
            .otherwise(col("total") % b +
              expr(s"(rk - (total % $b) * (total div $b + 1)) div (total div $b)"))
            + 1)
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), min(col("p")).as("min_price"),
          max(col("p")).as("max_price"), toD(sum(m2(col("p")))).as("sum_price"))
        .orderBy(col("bin"))
    },

    // ------------------------------------------------------------------
    // q131: per-key anomaly detection — flag events whose value deviates
    // more than 2σ from the SAME USER's own distribution. The z-score
    // test |x − μ| > kσ is evaluated entirely in BIGINTs by clearing
    // denominators: with n, s = Σx, q = Σx² per user (x = value in
    // floor-cents, exact on both engines — floor has no tie ambiguity,
    // unlike round), μ = s/n and σ² = (nq − s²)/n², so
    //   (nx − s)² > k²·(nq − s²)
    // is the exact integer form (the q98/q123 determinism doctrine: no
    // doubles in the decision). Scale shape: ONE scan → user-keyed
    // aggregate with map-side partials (state = 3 longs/user), stats
    // joined back on user_id (broadcast at test SF, an equi-shuffle at
    // 100 TB — both sides key-partitioned, never wider than the event
    // row), filter is a projection. Headroom: |nx − s| ≤ 2·n·max|x| and
    // n·q ≤ (n·max|x|)², so n·max|cents| ≤ ~1.5e9 keeps both squared
    // terms inside 2^63 — guarded on the measured per-user product
    // (divide-compare, so the guard itself cannot wrap), mirrored in
    // the oracle's error() CASE, and matched by the streaming twin's
    // multiplyExact: all three evaluators fail loudly, none wraps
    // (q88 doctrine).
    QuerySpec.sqlBacked("q131_outlier_events",
      """WITH x AS (SELECT event_id, user_id,
        |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |g AS (SELECT user_id, count(*) AS n, sum(cents) AS s,
        |        sum(cents * cents) AS q, max(abs(cents)) AS mx
        |      FROM x GROUP BY user_id HAVING count(*) >= 12),
        |gg AS (SELECT CASE WHEN mx > 1500000000 // n THEN CAST(error(
        |    'graft q131: n * max|cents| exceeds the BIGINT z-score
        | headroom (must stay under ~1.5e9 so (n*x-s)^2 and 4*(n*q-s*s)
        | fit 2^63) - widen to DECIMAL before running at this scale') AS
        |    BIGINT) ELSE n END AS n, user_id, s, q FROM g)
        |SELECT x.event_id, x.user_id, x.cents, gg.n
        |FROM x JOIN gg USING (user_id)
        |WHERE (gg.n * x.cents - gg.s) * (gg.n * x.cents - gg.s)
        |      > 4 * (gg.n * gg.q - gg.s * gg.s)
        |ORDER BY x.user_id, x.event_id""".stripMargin) { (s, dir) =>
      // literally the streaming twin's projection (drift-proof sharing)
      val x = graft.streaming.IncrementalOutliers
        .observations(Tables(s, dir, "events"))
        .toDF("event_id", "user_id", "cents")
      val g = x.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
          sum(col("cents") * col("cents")).as("q"),
          max(abs(col("cents"))).as("mx"))
        .filter(col("n") >= 12)
        // overflow-safe product guard (divide, never multiply — the
        // guard itself must not wrap): n * max|cents| <= ~1.5e9 keeps
        // (n*x - s)^2 and 4*(n*q - s^2) inside 2^63, so the plain-Long
        // batch decision cannot wrap where DuckDB promotes to HUGEINT
        // and the streaming twin multiplyExact-throws — all three
        // evaluators now fail loudly at the same documented boundary
        .withColumn("n", when(col("mx") > expr("1500000000L div n"), expr(
          "raise_error('graft q131: n * max|cents| exceeds the " +
            "BIGINT z-score headroom - widen to DECIMAL')").cast("long"))
          .otherwise(col("n")))
        .drop("mx")
      x.join(g, "user_id")
        .filter((col("n") * col("cents") - col("s"))
          * (col("n") * col("cents") - col("s"))
          > lit(4) * (col("n") * col("q") - col("s") * col("s")))
        .select(col("event_id"), col("user_id"), col("cents"), col("n"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // ------------------------------------------------------------------
    // q143: distributed weighted median — per return flag, the price at
    // which HALF THE QUANTITY has shipped (the inventory-weighted
    // center, not the row-weighted one q82 answers). Selection rule:
    // the first row in the (price, orderkey, linenumber) total order
    // whose doubled cumulative quantity reaches the flag's total —
    // exact integers on both sides of the comparison, so the crossing
    // row is engine-identical. The oracle states it as the obvious
    // per-flag window cumsum; the Spark side is the SCALE form and the
    // THIRD PrefixSum consumer (after q123/q125): ONE range shuffle
    // stamps the global cumulative, per-flag start offsets come from a
    // 3-row aggregate (cumulative within flag = global − offset), and
    // the crossing row is a min-struct argmin — the per-flag
    // single-task window the oracle runs appears nowhere.
    QuerySpec.sqlBacked("q143_weighted_median",
      """WITH x AS (SELECT l_returnflag AS f, l_extendedprice AS p,
        |    CAST(l_quantity AS BIGINT) AS q, l_orderkey AS ok,
        |    l_linenumber AS ln FROM lineitem),
        |c AS (SELECT *, sum(q) OVER (PARTITION BY f ORDER BY p, ok, ln
        |        ROWS UNBOUNDED PRECEDING) AS cw,
        |      sum(q) OVER (PARTITION BY f) AS tw FROM x),
        |m AS (SELECT f, tw, p, row_number() OVER (PARTITION BY f
        |        ORDER BY p, ok, ln) AS rn
        |      FROM c WHERE 2 * cw >= tw)
        |SELECT f AS l_returnflag, CAST(tw AS BIGINT) AS total_qty,
        |       p AS median_price
        |FROM m WHERE rn = 1 ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
      flagCumQty(s, dir)
        .filter(lit(2) * col("cumw") >= col("tw"))
        .groupBy(col("f"), col("tw"))
        .agg(min(struct(col("p"), col("ok"), col("ln"))).as("m"))
        .select(col("f").as("l_returnflag"), col("tw").as("total_qty"),
          col("m.p").as("median_price"))
        .orderBy(col("l_returnflag"))
    },

    // ------------------------------------------------------------------
    // q144: one-pass weighted quartiles — q143 generalized: p25/p50/p75
    // of the quantity-weighted price distribution per flag, all three
    // crossing rows selected from the SAME PrefixSum-stamped frame in
    // ONE aggregate (min-struct over a threshold-filtered when() per
    // quantile) — three quantiles for the price of one range shuffle,
    // where the oracle's window form pays a per-flag serialized cumsum
    // and three ranked scans. Thresholds compare exact integers
    // (4·cum ≥ k·total), so every crossing row is engine-identical.
    QuerySpec.sqlBacked("q144_weighted_quartiles",
      """WITH x AS (SELECT l_returnflag AS f, l_extendedprice AS p,
        |    CAST(l_quantity AS BIGINT) AS q, l_orderkey AS ok,
        |    l_linenumber AS ln FROM lineitem),
        |c AS (SELECT *, sum(q) OVER (PARTITION BY f ORDER BY p, ok, ln
        |        ROWS UNBOUNDED PRECEDING) AS cw,
        |      sum(q) OVER (PARTITION BY f) AS tw FROM x),
        |m1 AS (SELECT f, tw, p, row_number() OVER (PARTITION BY f
        |         ORDER BY p, ok, ln) AS rn FROM c WHERE 4 * cw >= tw),
        |m2 AS (SELECT f, p, row_number() OVER (PARTITION BY f
        |         ORDER BY p, ok, ln) AS rn FROM c WHERE 2 * cw >= tw),
        |m3 AS (SELECT f, p, row_number() OVER (PARTITION BY f
        |         ORDER BY p, ok, ln) AS rn FROM c WHERE 4 * cw >= 3 * tw)
        |SELECT m1.f AS l_returnflag, CAST(m1.tw AS BIGINT) AS total_qty,
        |       m1.p AS p25_price, m2.p AS median_price, m3.p AS p75_price
        |FROM m1 JOIN m2 ON m1.f = m2.f AND m2.rn = 1
        |        JOIN m3 ON m1.f = m3.f AND m3.rn = 1
        |WHERE m1.rn = 1 ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      def pick(cond: org.apache.spark.sql.Column) =
        min(when(cond, col("s")))
      flagCumQty(s, dir)
        // build the comparable struct ONCE per row; the three quantile
        // arms share it (3x fewer struct allocations in the aggregate)
        .withColumn("s", struct(col("p"), col("ok"), col("ln")))
        .groupBy(col("f"), col("tw"))
        .agg(pick(lit(4) * col("cumw") >= col("tw")).as("q1"),
          pick(lit(2) * col("cumw") >= col("tw")).as("q2"),
          pick(lit(4) * col("cumw") >= lit(3) * col("tw")).as("q3"))
        .select(col("f").as("l_returnflag"), col("tw").as("total_qty"),
          col("q1.p").as("p25_price"), col("q2.p").as("median_price"),
          col("q3.p").as("p75_price"))
        .orderBy(col("l_returnflag"))
    },

    // ------------------------------------------------------------------
    // q136: join-key skew audit — the pre-flight report a pipeline runs
    // BEFORE a big join to decide whether it needs the salted path
    // (operators.SkewJoin / q104): for each prospective join key, the
    // row count, distinct-key count, the hottest key and its count
    // (ties broken by lowest key — total order), and the hot key's
    // share. AQE's skew handling only kicks in at runtime per join;
    // this audit is how a 100 TB pipeline decides at PLAN time which
    // keys need salting, bucketing, or a broadcast rewrite. Scale: one
    // two-level aggregate per key column (both levels map-side-partial;
    // the second level reduces to ONE row), nothing else.
    QuerySpec.sqlBacked("q136_skew_audit", {
      skewEdges.map { case (t, k) =>
        val e = if (t == "events")
          "SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events"
        else s"SELECT * FROM $t"
        s"""SELECT '$t.$k' AS key_col, CAST(sum(c) AS BIGINT) AS n_rows,
           |  CAST(count(*) AS BIGINT) AS n_keys,
           |  (SELECT k FROM (SELECT $k AS k, count(*) AS c FROM ($e)
           |     GROUP BY $k) ORDER BY c DESC, k LIMIT 1) AS hot_key,
           |  max(c) AS hot_n,
           |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS hot_share
           |FROM (SELECT $k, CAST(count(*) AS BIGINT) AS c FROM ($e)
           |      GROUP BY $k)""".stripMargin
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY key_col")
    }) { (s, dir) =>
      skewEdges.map { case (t, k) =>
        Tables(s, dir, t)
          .groupBy(col(k).as("k")).agg(count(lit(1)).as("c"))
          .agg(sum(col("c")).as("n_rows"),
            count(lit(1)).cast("long").as("n_keys"),
            min(struct((-col("c")).as("nc"), col("k").as("kk"))).as("m"),
            max(col("c")).as("hot_n"))
          .select(lit(s"$t.$k").as("key_col"), col("n_rows"),
            col("n_keys"), col("m.kk").as("hot_key"), col("hot_n"),
            (col("hot_n").cast("double") / col("n_rows").cast("double"))
              .as("hot_share"))
      }.reduce(_ union _).orderBy(col("key_col"))
    },

    // ------------------------------------------------------------------
    // q162: EXACT-allocation stratified sample — per market segment,
    // exactly ⌈n/10⌉ customers, selected as the stratum's smallest 10%
    // by md5(key) (a deterministic uniform order, the q51 doctrine).
    // q51 is the one-pass Bernoulli form: zero shuffle but binomial
    // variance in the per-stratum counts; this is the form an eval-set
    // builder needs when the allocation itself is the contract. The
    // textbook formulation — row_number() per stratum — is the ORACLE
    // below, and at 100 TB it is a per-stratum global sort landing a
    // whole stratum on one task (|strata| is small: the q51 skew in its
    // worst form). The Spark side instead does distributed SELECTION:
    // (a) bucket rows by the hash's first byte; (b) one tiny aggregate
    // — ≤ |strata|·256 rows, collected under the k-row-frame contract —
    // gives each stratum's bucket histogram, from which the driver
    // finds the boundary bucket where the cumulative count crosses
    // k = ⌈n/10⌉ and how many rows it still needs from it; (c) buckets
    // below the boundary pass WHOLE (no sort anywhere), and only the
    // boundary bucket — 1/256 of one stratum, and geometrically smaller
    // under a longer prefix if a task can't hold it — pays a rank. Two
    // scan passes (whole-buckets + boundary), both pure projections
    // against a broadcast 1-row-per-stratum cut frame.
    QuerySpec.sqlBacked("q162_exact_stratified",
      """WITH r AS (SELECT c_custkey, c_mktsegment,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn,
        |    count(*) OVER (PARTITION BY c_mktsegment) AS n
        |  FROM customer)
        |SELECT c_custkey, c_mktsegment FROM r
        |WHERE rn * 10 <= n + 9
        |ORDER BY c_mktsegment, c_custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val base = Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          md5(col("c_custkey").cast("string")).as("h"))
        .withColumn("b", substring(col("h"), 1, 2))
      // ≤ |strata|·256 rows — bounded driver state, not a corpus collect
      val hist = base.groupBy(col("c_mktsegment"), col("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val cuts = hist.groupBy(_._1).map { case (seg, rows) =>
        val n = rows.map(_._3).sum
        val k = (n + 9) / 10 // ⌈n/10⌉; n ≥ 1 per grouped stratum
        val byB = rows.sortBy(_._2)
        val cum = byB.scanLeft(0L)(_ + _._3).tail
        val i = cum.indexWhere(_ >= k) // exists: cum.last = n ≥ k
        (seg, byB(i)._2, k - (if (i == 0) 0L else cum(i - 1)))
      }.toSeq.toDF("c_mktsegment", "bb", "need")
      val joined = base.join(broadcast(cuts), "c_mktsegment")
      val whole = joined.filter(col("b") < col("bb"))
        .select(col("c_custkey"), col("c_mktsegment"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_mktsegment"))
        .orderBy(col("h"), col("c_custkey"))
      val edge = joined.filter(col("b") === col("bb"))
        .withColumn("rn", row_number().over(win))
        .filter(col("rn") <= col("need"))
        .select(col("c_custkey"), col("c_mktsegment"))
      whole.unionAll(edge)
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    },

    // ------------------------------------------------------------------
    // q164: exact two-sample Kolmogorov–Smirnov drift — did the `value`
    // distribution move between the corpus's first and second time
    // half? The distributional companion to q128's categorical TV
    // drift: KS D = max_x |F1(x) − F2(x)|, the standard continuous-
    // drift statistic. Everything is integer-exact: the split point is
    // the integral midpoint of the observed time span (2·ts < min+max),
    // the support is floor-cents (the shared Cols.cents projection),
    // and D is carried as the integer NUMERATOR max|cum1·n2 − cum2·n1|
    // over the common denominator n1·n2 — no per-row double CDFs whose
    // summation order could drift across engines. The cumulative pair
    // (F1, F2) over the merged support is PrefixSum.inclusiveMulti:
    // BOTH CDFs ride ONE range shuffle of the |support|-sized histogram
    // (the oracle runs the textbook un-partitioned window DuckDB can
    // afford at test SF — the exact single-task collapse the scan
    // machinery exists to avoid). Cross-products are guarded fail-loud
    // at 3e9 rows per side (n1·n2 ≤ 2^63 — the q131 magnitude
    // doctrine; past that the numerator needs DECIMAL, a different
    // contract than silent wrap).
    QuerySpec.sqlBacked("q164_ks_drift",
      """WITH e AS (SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |b AS (SELECT min(us) AS mn, max(us) AS mx FROM e),
        |o AS (SELECT cents,
        |    CASE WHEN 2 * us < mn + mx THEN 1 ELSE 0 END AS s1
        |  FROM e, b),
        |g AS (SELECT cents, CAST(sum(s1) AS BIGINT) AS c1,
        |    CAST(sum(1 - s1) AS BIGINT) AS c2 FROM o GROUP BY cents),
        |c AS (SELECT cents,
        |    CAST(sum(c1) OVER w AS BIGINT) AS cum1,
        |    CAST(sum(c2) OVER w AS BIGINT) AS cum2
        |  FROM g WINDOW w AS (ORDER BY cents ROWS UNBOUNDED PRECEDING)),
        |n AS (SELECT CAST(sum(s1) AS BIGINT) AS n1,
        |    CAST(sum(1 - s1) AS BIGINT) AS n2 FROM o),
        |d AS (SELECT cents, abs(cum1 * n2 - cum2 * n1) AS dn FROM c, n)
        |SELECT (SELECT n1 FROM n) AS n1, (SELECT n2 FROM n) AS n2,
        |  CAST(max(dn) AS BIGINT) AS d_num,
        |  (SELECT cents FROM d ORDER BY dn DESC, cents LIMIT 1)
        |    AS at_cents,
        |  CAST(max(dn) AS DOUBLE) /
        |    (CAST((SELECT n1 FROM n) AS DOUBLE) *
        |     CAST((SELECT n2 FROM n) AS DOUBLE)) AS d_stat
        |FROM d""".stripMargin) { (s, dir) =>
      import graft.functions.Cols
      val e = Tables(s, dir, "events")
        .select(Cols.cents(col("value")).as("cents"),
          unix_micros(col("ts")).as("us"))
      val b = e.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
      val o = e.crossJoin(broadcast(b))
        .select(col("cents"),
          when(lit(2) * col("us") < col("mn") + col("mx"), 1L)
            .otherwise(0L).as("s1"))
      val g = o.groupBy(col("cents"))
        .agg(sum(col("s1")).as("c1"), sum(lit(1L) - col("s1")).as("c2"))
      val c = graft.operators.PrefixSum.inclusiveMulti(g,
        Seq(col("cents")), Seq("c1", "c2"), Seq("cum1", "cum2"))
      // 1-row side frame: the side totals are the CDFs' final values,
      // so max(cum) reads them back through the scan's own shuffle
      // files (ScanStamp's reuse property) — re-aggregating `o` or `g`
      // would re-scan events. The guard keeps cum·n inside Long
      // (silent wrap would diverge from DuckDB's overflow ERROR —
      // fail loudly at the same boundary instead)
      val n = c.agg(max(col("cum1")).as("n1"), max(col("cum2")).as("n2"))
        .select(expr("IF(n1 <= 3000000000 AND n2 <= 3000000000, n1, " +
          "raise_error('graft q164: side beyond 3e9 rows; integer KS " +
          "numerator would overflow — use a DECIMAL variant'))").as("n1"),
          col("n2"))
      val d = c.crossJoin(broadcast(n))
        .select(col("n1"), col("n2"), col("cents"),
          abs(col("cum1") * col("n2") - col("cum2") * col("n1")).as("dn"))
      d.groupBy(col("n1"), col("n2"))
        .agg(max(col("dn")).as("d_num"),
          min(struct((-col("dn")).as("neg"), col("cents").as("at"))).as("m"))
        .select(col("n1"), col("n2"), col("d_num"),
          col("m.at").as("at_cents"),
          (col("d_num").cast("double") /
            (col("n1").cast("double") * col("n2").cast("double")))
            .as("d_stat"))
    },

    // ------------------------------------------------------------------
    // q171: k-anonymity audit — the privacy-governance gate a corpus
    // passes BEFORE release: every quasi-identifier combination
    // (nation, market segment, coarsened balance bin) whose group holds
    // fewer than k=5 individuals re-identifies its members and must be
    // suppressed or generalized. The audit lists exactly those cells
    // with their sizes — the suppression worklist. Companion to q85
    // (pseudonymization hides direct identifiers; k-anonymity is about
    // the indirect ones) and q101 (content PII). Scale: ONE hash
    // aggregate keyed by the QI tuple (map-side partials), the k filter
    // is post-aggregate, output bounded by the violating-cell count —
    // nothing else crosses the exchange. The bin width is the
    // generalization knob: widening it is how the pipeline iterates
    // toward an anonymous release.
    QuerySpec.sqlBacked("q171_kanonymity",
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_bin,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM customer
        |GROUP BY c_nationkey, c_mktsegment, bal_bin
        |HAVING count(*) < 5
        |ORDER BY c_nationkey, c_mktsegment, bal_bin""".stripMargin) {
      (s, dir) =>
      Tables(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 2000).cast("long").as("bal_bin"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") < 5)
        .orderBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bin"))
    },

    // ------------------------------------------------------------------
    // q181: l-diversity audit — k-anonymity's (q171) stronger sibling:
    // a QI cell can hold k >= 5 members and STILL leak if they all
    // share one sensitive value (the homogeneity attack). Sensitive
    // attribute here: the order priority of the cell's members' orders;
    // any cell whose members' orders show fewer than l = 3 distinct
    // priorities is the disclosure worklist. Same QI tuple as q171, so
    // the two audits compose into one release gate. Scale: the fact
    // join shuffles on custkey exactly once (or broadcasts the pruned
    // customer dim), then ONE aggregate keyed by the QI tuple;
    // count(DISTINCT) runs as Spark's standard two-phase expand — both
    // exchanges bounded by |cells| x |priority domain|, output by the
    // violating-cell count.
    QuerySpec.sqlBacked("q181_ldiversity",
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_bin,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS l_div
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_nationkey, c_mktsegment, bal_bin
        |HAVING count(DISTINCT o_orderpriority) < 3
        |ORDER BY c_nationkey, c_mktsegment, bal_bin""".stripMargin) {
      (s, dir) =>
      Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 2000).cast("long").as("bal_bin"))
        .join(Tables(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderpriority")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bin"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("o_orderpriority")).as("l_div"))
        .filter(col("l_div") < 3)
        .orderBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bin"))
    },

    // ------------------------------------------------------------------
    // q217: t-closeness — the third rung of the anonymity ladder
    // (q171 k-anonymity: classes too SMALL; q181 l-diversity: classes
    // with too few DISTINCT sensitive values; this: classes whose
    // sensitive DISTRIBUTION leaks — l-diversity passes a class that
    // is 99% one priority as long as others appear once). Per
    // quasi-identifier class, the variational distance between the
    // class's o_orderpriority distribution and the global one,
    // denominators cleared so the gate is pure BIGINT:
    // tvd_num = Σ_v |cnt_cv·N − g_v·n_c| over ALL global values
    // (absent values contribute g_v·n_c), tvd_den = 2·n_c·N, and a
    // class is flagged iff D > 1/5 ⟺ 5·tvd_num > 2·n_c·N — the
    // cross-multiplied comparison, one double division only for the
    // reported D (q88/q91 doctrine). Scale: two keyed aggregates over
    // the join, a |classes|×|values| completion against the
    // broadcast value dimension (|values| = 5 priorities), and a
    // class-keyed re-aggregate — map-side partials end to end, no
    // window. Headroom: cnt·N ≤ N² keeps BIGINT to N ~ 3e9 rows;
    // ANSI multiplication fails loudly past it.
    QuerySpec.sqlBacked("q217_tcloseness",
      """WITH j AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_bin,
        |    o_orderpriority AS v
        |  FROM customer JOIN orders ON o_custkey = c_custkey),
        |g AS (SELECT v, CAST(count(*) AS BIGINT) AS gv FROM j GROUP BY v),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM j),
        |cls AS (SELECT c_nationkey, c_mktsegment, bal_bin,
        |          CAST(count(*) AS BIGINT) AS nc
        |        FROM j GROUP BY 1, 2, 3),
        |cv AS (SELECT c_nationkey, c_mktsegment, bal_bin, v,
        |         CAST(count(*) AS BIGINT) AS cnt
        |       FROM j GROUP BY 1, 2, 3, 4),
        |x AS (SELECT cls.c_nationkey AS nk, cls.c_mktsegment AS seg,
        |        cls.bal_bin AS bb, cls.nc, g.v, g.gv,
        |        COALESCE(cv.cnt, 0) AS cnt
        |      FROM cls CROSS JOIN g
        |      LEFT JOIN cv ON cv.c_nationkey = cls.c_nationkey
        |        AND cv.c_mktsegment = cls.c_mktsegment
        |        AND cv.bal_bin = cls.bal_bin AND cv.v = g.v),
        |d AS (SELECT nk, seg, bb, max(nc) AS n_rows,
        |        CAST(sum(abs(cnt * (SELECT n FROM tot) - gv * nc))
        |          AS BIGINT) AS tvd_num
        |      FROM x GROUP BY nk, seg, bb)
        |SELECT nk AS c_nationkey, seg AS c_mktsegment, bb AS bal_bin,
        |  n_rows, tvd_num,
        |  CAST(2 * n_rows * (SELECT n FROM tot) AS BIGINT) AS tvd_den,
        |  CAST(tvd_num AS DOUBLE)
        |    / CAST(2 * n_rows * (SELECT n FROM tot) AS DOUBLE)
        |    AS tcloseness
        |FROM d WHERE 5 * tvd_num > 2 * n_rows * (SELECT n FROM tot)
        |ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val j = Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 2000).cast("long").as("bal_bin"))
        .join(Tables(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderpriority").as("v")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("bal_bin"),
          col("v"))
      Dedup.withScratch(j) {
        val qi = Seq("c_nationkey", "c_mktsegment", "bal_bin")
        val g = j.groupBy(col("v")).agg(count(lit(1)).as("gv"))
        val tot = j.agg(count(lit(1)).as("n"))
        val cls = j.groupBy(qi.map(col): _*).agg(count(lit(1)).as("nc"))
        val cv = j.groupBy((qi :+ "v").map(col): _*)
          .agg(count(lit(1)).as("cnt"))
        cls.crossJoin(broadcast(g))
          .join(cv, qi :+ "v", "left")
          .select(qi.map(col) :+ col("nc") :+ col("gv") :+
            coalesce(col("cnt"), lit(0L)).as("cnt"): _*)
          .crossJoin(broadcast(tot))
          .groupBy(qi.map(col): _*)
          .agg(max(col("nc")).as("n_rows"), max(col("n")).as("n"),
            sum(abs(col("cnt") * col("n") - col("gv") * col("nc")))
              .as("tvd_num"))
          .filter(lit(5L) * col("tvd_num") >
            lit(2L) * col("n_rows") * col("n"))
          .select(qi.map(col) :+ col("n_rows") :+ col("tvd_num") :+
            (lit(2L) * col("n_rows") * col("n")).as("tvd_den") :+
            (col("tvd_num").cast("double") /
              (lit(2L) * col("n_rows") * col("n")).cast("double"))
              .as("tcloseness"): _*)
          .orderBy(qi.map(col): _*)
      }
    },

    // ------------------------------------------------------------------
    // q182: water-filling token-budget allocation — the training-MIX
    // planner: given each source's token supply and a total budget
    // (60% of the corpus here), the max-min fair allocation gives every
    // source min(supply, L) with the water level L set so allocations
    // sum EXACTLY to the budget. This is the step that decides per-
    // domain sampling quotas before q123/q125 materialize them. Exact
    // in integers: sources sorted by ascending supply, a source is
    // CAPPED (takes its full supply) iff
    //   supply · (remaining sources) <= budget − (smaller supplies),
    // and that condition is provably monotone down the sort (f(i+1) −
    // f(i) = (s_i − s_{i+1})(N − i) <= 0), so the capped set is a
    // PREFIX — one cumulative-sum window pass decides it, no iteration.
    // The leftover divides as div/mod with the mod distributed one
    // token each to the first `rem` uncapped sources (deterministic,
    // and each gets <= its supply: the first uncapped source's supply
    // strictly exceeds the level by the defining inequality). Scale:
    // the corpus pays ONE map-side-combined count aggregate; everything
    // after runs on the |sources|-row dimension (the single-partition
    // window over 20 rows is the documented benign class — bounded by
    // the source count, never the corpus).
    QuerySpec.sqlBacked("q182_token_waterfill",
      s"""WITH $waterfillCtes
        |SELECT source, supply, capped, alloc
        |FROM walloc ORDER BY source""".stripMargin) { (s, dir) =>
      waterfill(Tables.spread(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("supply")))
        .orderBy(col("source"))
    },

    // ------------------------------------------------------------------
    // q190: sequence packing — the context-window bin packer every LLM
    // training pipeline runs between corpus prep and the data loader:
    // concatenate documents into fixed-capacity token sequences (cap 256
    // here) so padding waste stays low. Semantics: greedy NEXT-FIT in
    // doc_id order, shard-local within (source, doc_id/64) — the shard
    // boundary is the deliberate determinism/parallelism contract (a
    // global greedy would serialize the corpus; production packers shard
    // exactly like this). Oversized docs truncate to the cap and occupy
    // a bin alone. Output: each doc's bin and token offset within its
    // bin. Scale: ONE hash exchange on (source, chunk) with uniform
    // 64-doc-max groups and O(1) carried state — the packing itself
    // never shuffles token payloads, only (doc_id, n_tok) pairs. The
    // oracle replays the same greedy as a recursive CTE stepping down
    // each shard's row_number chain (depth <= 64 by the shard bound).
    QuerySpec.sqlBacked("q190_sequence_pack",
      s"""WITH RECURSIVE $packCtes
        |SELECT doc_id, source, chunk, bin_id, fill - n_tok AS off, n_tok
        |FROM pack ORDER BY doc_id""".stripMargin) { (s, dir) =>
      packSeqs(Tables.spread(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tok")),
        cap = 256L, chunkSpan = 64L)
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // q191: curriculum epoch assignment — the schedule planner between
    // q182's mix quotas and q190's packer: order the corpus by a
    // deterministic quality score (integer lexical diversity here,
    // 100·|distinct words| div |words| — highest-diversity docs train
    // first) and cut the ordering into fixed token-budget epochs
    // (budget = 1 + total div 4, so ~4 epochs), assigning each doc the
    // epoch its START offset falls in. The global running token sum is
    // the FIFTH PrefixSum consumer: one range shuffle on the curriculum
    // order stamps exact cumulative tokens — never the single-task
    // `sum OVER (ORDER BY ...)` window the oracle runs. Everything is
    // integer arithmetic, so the epoch boundaries are engine-identical.
    QuerySpec.sqlBacked("q191_curriculum_epochs",
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(100 * len(list_distinct(string_split(text, ' ')))
        |      // len(string_split(text, ' ')) AS BIGINT) AS score
        |  FROM documents),
        |c AS (SELECT *,
        |    CAST(sum(n_tok) OVER (ORDER BY score DESC, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(sum(n_tok) OVER () AS BIGINT) AS total FROM d)
        |SELECT doc_id, source, score, n_tok,
        |  CAST((cum - n_tok) // (1 + total // 4) + 1 AS BIGINT) AS epoch
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.spread(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          expr("100L * size(array_distinct(split(text, ' '))) div " +
            "size(split(text, ' '))").as("score"))
      val cum = graft.operators.PrefixSum.inclusive(
        d.withColumn("nscore", -col("score")),
        Seq(col("nscore"), col("doc_id")), "n_tok", "cum")
      val tot = d.agg(sum(col("n_tok")).as("total"))
      cum.crossJoin(broadcast(tot))
        .select(col("doc_id"), col("source"), col("score"), col("n_tok"),
          (expr("(cum - n_tok) div (1 + total div 4)") + lit(1L))
            .as("epoch"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // q192: packed-sequence materialization — q190's payload stage: the
    // assignment (computed on narrow (doc_id, n_tok) columns) joins
    // back to the corpus ONCE and each bin concatenates its docs'
    // token-truncated text in doc_id order into the training sequence
    // the loader actually reads. Deliberate two-phase shape: the
    // packing decision never shuffles text; the text shuffles exactly
    // once, already routed to its (source, chunk, bin) group — the
    // honest materialization cost no packer avoids. In-bin order is
    // pinned by sorting the collected (doc_id, text) structs, not by
    // shuffle arrival (collect_list order is nondeterministic by
    // contract). Truncation applies to the PAYLOAD too: a doc packed
    // at n_tok = cap contributes exactly its first cap tokens.
    QuerySpec.sqlBacked("q192_sequence_materialize",
      s"""WITH RECURSIVE $packCtes
        |SELECT p.source, p.chunk, p.bin_id,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(p.n_tok) AS BIGINT) AS fill,
        |  string_agg(
        |    array_to_string(
        |      (string_split(doc.text, ' '))[1:CAST(p.n_tok AS INT)], ' '),
        |    ' ' ORDER BY p.doc_id) AS seq_text
        |FROM pack p JOIN documents doc USING (doc_id)
        |GROUP BY p.source, p.chunk, p.bin_id
        |ORDER BY p.source, p.chunk, p.bin_id""".stripMargin) { (s, dir) =>
      val docs = Tables.spread(s, dir, "documents")
      val asg = packSeqs(docs
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tok")),
        cap = 256L, chunkSpan = 64L)
      asg.join(docs.select(col("doc_id"),
          expr("array_join(slice(split(text, ' '), 1, " +
            "CAST(least(size(split(text, ' ')), 256L) AS INT)), ' ')")
            .as("t")), "doc_id")
        .groupBy(col("source"), col("chunk"), col("bin_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("fill"),
          expr("array_join(transform(" +
            "array_sort(collect_list(struct(doc_id, t))), x -> x.t), ' ')")
            .as("seq_text"))
        .orderBy(col("source"), col("chunk"), col("bin_id"))
    },

    // ------------------------------------------------------------------
    // q193: best-fit-decreasing packing — the OFFLINE quality packer
    // beside q190's next-fit: sort each shard's docs by descending
    // token count and place each in the fullest open bin that still
    // fits (ties to the lowest bin index). Classic BFD uses at most
    // 11/9·OPT + 4 bins (Johnson '73) vs next-fit's 2·OPT — the
    // utilization/streamability trade q194 then quantifies. Same shard
    // contract and single hash exchange as q190; the fold carries the
    // shard's open-bin fill list instead of one cursor. The oracle
    // replays the same walk as a recursive CTE whose state is that
    // fill LIST (DuckDB list_filter/list_max/list_position pick the
    // bin; first-position-of-max = the lowest-index tie-break).
    QuerySpec.sqlBacked("q193_sequence_pack_bfd",
      s"""WITH RECURSIVE $bfdCtes
        |SELECT doc_id, source, chunk, bin_id, off, n_tok
        |FROM bfd ORDER BY doc_id""".stripMargin) { (s, dir) =>
      packBestFit(Tables.spread(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tok")),
        cap = 256L, chunkSpan = 64L)
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // q194: packing-policy comparison — the report that justifies the
    // packer choice: per source, bins opened, tokens packed, and
    // integer utilization percent (100·tokens div (bins·cap)) for
    // next-fit vs best-fit-decreasing, from the SAME two assignment
    // definitions q190/q193 gate (both CTE pairs in one statement —
    // the shared-definition anti-drift doctrine, applied twice). At
    // scale both sides are the q190-shaped narrow-column exchange plus
    // a |sources|-row aggregate; nothing new shuffles.
    QuerySpec.sqlBacked("q194_packing_policy_stats",
      s"""WITH RECURSIVE $packCtes,
        |$bfdCtes
        |SELECT source, policy,
        |  CAST(n_bins AS BIGINT) AS n_bins,
        |  CAST(tokens AS BIGINT) AS tokens,
        |  CAST(100 * tokens // (n_bins * 256) AS BIGINT) AS util_pct
        |FROM (
        |  SELECT source, 'nf' AS policy,
        |    count(DISTINCT (chunk, bin_id)) AS n_bins,
        |    sum(n_tok) AS tokens
        |  FROM pack GROUP BY source
        |  UNION ALL
        |  SELECT source, 'bfd' AS policy,
        |    count(DISTINCT (chunk, bin_id)) AS n_bins,
        |    sum(n_tok) AS tokens
        |  FROM bfd GROUP BY source)
        |ORDER BY source, policy""".stripMargin) { (s, dir) =>
      val docs = Tables.spread(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      def stats(asg: org.apache.spark.sql.DataFrame, policy: String) =
        asg.groupBy(col("source"))
          .agg(countDistinct(col("chunk"), col("bin_id")).as("n_bins"),
            sum(col("n_tok")).as("tokens"))
          .select(col("source"), lit(policy).as("policy"), col("n_bins"),
            col("tokens"),
            expr("100L * tokens div (n_bins * 256L)").as("util_pct"))
      stats(packSeqs(docs, 256L, 64L), "nf")
        .unionAll(stats(packBestFit(docs, 256L, 64L), "bfd"))
        .orderBy(col("source"), col("policy"))
    },

    // ------------------------------------------------------------------
    // q195: training-mix materialization — the step that EXECUTES
    // q182's quotas: for each source, keep the doc_id-ordered prefix of
    // whole documents whose cumulative token count fits the source's
    // water-filled allocation (deterministic underfill at the boundary;
    // no partial docs). Closes the corpus-prep arc: q182 decides the
    // quotas, THIS materializes the mix, q191 orders it, q190/q193
    // pack it, q192 emits sequences. The per-source running token sum
    // is the SIXTH PrefixSum consumer, in the flagCumQty shape: ONE
    // range exchange over (source, doc_id) stamps the global sum, a
    // |sources|-row broadcast offset frame localizes it, and the quota
    // itself arrives as the broadcast |sources|-row walloc dimension.
    // The oracle shares q182's CTE chain verbatim (waterfillCtes), so
    // quota and materialization can never disagree on the allocation.
    QuerySpec.sqlBacked("q195_mix_materialize",
      s"""WITH $waterfillCtes,
        |d AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |cw AS (SELECT doc_id, source, n_tok,
        |    CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw FROM d)
        |SELECT doc_id, source, n_tok, cumw
        |FROM cw JOIN walloc USING (source)
        |WHERE cumw <= alloc ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.spread(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val alloc = waterfill(docs.groupBy(col("source"))
          .agg(sum(col("n_tok")).as("supply")))
        .select(col("source"), col("alloc"))
      val cum = graft.operators.PrefixSum.inclusive(docs,
        Seq(col("source"), col("doc_id")), "n_tok", "cum")
      val offs = docs.groupBy(col("source")).agg(sum(col("n_tok")).as("tw"))
        .withColumn("off", coalesce(
          sum(col("tw")).over(org.apache.spark.sql.expressions.Window
            .orderBy(col("source"))
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, -1)), lit(0L)))
        .select(col("source"), col("off"))
      cum.join(broadcast(offs), "source")
        .withColumn("cumw", col("cum") - col("off"))
        .join(broadcast(alloc), "source")
        .filter(col("cumw") <= col("alloc"))
        .select(col("doc_id"), col("source"), col("n_tok"), col("cumw"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // q173: winsorized robust statistics — per event type, the p10/p90
    // cut points of the cents distribution and the mean AFTER clipping
    // to them: the robust feature-scaling step that keeps one fat-tailed
    // outlier from dominating a normalized feature (the practical
    // alternative to q131's drop-the-outliers). Cut selection is the
    // q143 crossing-row rule with weight 1 (10·rank ≥ n, 10·rank ≥ 9n)
    // on exact integer cents, so the cuts — and therefore the clipped
    // sum — are engine-identical; the winsorized mean is one exact
    // integer ratio evaluated in double (the q99 convention). Scale:
    // the FOURTH PrefixSum rank consumer — one range shuffle stamps
    // global ranks, per-type offsets come from a |types|-row aggregate,
    // BOTH cuts come from ONE min-when aggregate (the q144 trick), and
    // the clip pass is a scan against the broadcast cut table with
    // map-side partials. The oracle runs the per-type window form.
    QuerySpec.sqlBacked("q173_winsorized_stats",
      """WITH x AS (SELECT event_type AS t,
        |    CAST(floor(value * 100) AS BIGINT) AS cents,
        |    event_id AS eid FROM events),
        |c AS (SELECT *, row_number() OVER
        |        (PARTITION BY t ORDER BY cents, eid) AS rn,
        |      CAST(count(*) OVER (PARTITION BY t) AS BIGINT) AS n FROM x),
        |cuts AS (SELECT t, n,
        |    min(CASE WHEN 10 * rn >= n THEN cents END) AS lo_cents,
        |    min(CASE WHEN 10 * rn >= 9 * n THEN cents END) AS hi_cents
        |  FROM c GROUP BY t, n)
        |SELECT k.t AS event_type, k.n, k.lo_cents, k.hi_cents,
        |  CAST(sum(greatest(least(x.cents, k.hi_cents), k.lo_cents))
        |    AS BIGINT) AS wsum,
        |  CAST(CAST(sum(greatest(least(x.cents, k.hi_cents), k.lo_cents))
        |    AS BIGINT) AS DOUBLE) / k.n AS wmean
        |FROM x JOIN cuts k ON x.t = k.t
        |GROUP BY k.t, k.n, k.lo_cents, k.hi_cents
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val x = Tables(s, dir, "events")
        .select(col("event_type").as("t"),
          floor(col("value") * 100).cast("long").as("v"),
          col("event_id").as("id"))
      Dedup.withScratch(x) {
        // global rank via the range shuffle; per-type rank = global − off
        val ranked = typedRank(x)
        def pick(cond: org.apache.spark.sql.Column) =
          min(when(cond, col("v")))
        val cuts = ranked.groupBy(col("t"), col("n"))
          .agg(pick(lit(10) * col("rnw") >= col("n")).as("lo_cents"),
            pick(lit(10) * col("rnw") >= lit(9) * col("n")).as("hi_cents"))
        x.join(broadcast(cuts), "t")
          .select(col("t"), col("n"), col("lo_cents"), col("hi_cents"),
            greatest(least(col("v"), col("hi_cents")),
              col("lo_cents")).as("wc"))
          .groupBy(col("t"), col("n"), col("lo_cents"), col("hi_cents"))
          .agg(sum(col("wc")).as("wsum"))
          .select(col("t").as("event_type"), col("n"), col("lo_cents"),
            col("hi_cents"), col("wsum"),
            (col("wsum").cast("double") / col("n")).as("wmean"))
          .orderBy(col("event_type"))
      }
    },

    // ------------------------------------------------------------------
    // q175: median/MAD robust outlier profile — per event type, the
    // median, the median absolute deviation, and how many events sit
    // beyond 3×MAD. The robust complement to q131's variance z-score:
    // variance is dragged by the very outliers it hunts (breakdown
    // point 0), median/MAD tolerates up to half the data being wild —
    // the estimator a fat-tailed spend distribution actually needs.
    // Both medians are LOWER medians by the crossing-row rule
    // (first value where 2·rank ≥ n — exact integers, engine-identical,
    // no even-n interpolation), and the 3×MAD flag compares exact
    // integer cents. Scale: TWO typedRank passes (median of values,
    // then median of deviations — MAD is inherently two-round) — each
    // ONE PrefixSum range shuffle, cut rows broadcast back, the final
    // count a scan with map-side partials; the oracle runs the per-type
    // window form of both rounds.
    QuerySpec.sqlBacked("q175_mad_outliers",
      """WITH x AS (SELECT event_type AS t,
        |    CAST(floor(value * 100) AS BIGINT) AS c, event_id AS id
        |  FROM events),
        |r1 AS (SELECT *, row_number() OVER
        |      (PARTITION BY t ORDER BY c, id) AS rn,
        |    CAST(count(*) OVER (PARTITION BY t) AS BIGINT) AS n FROM x),
        |med AS (SELECT t, n, min(CASE WHEN 2 * rn >= n THEN c END) AS med
        |        FROM r1 GROUP BY t, n),
        |dv AS (SELECT x.t, abs(x.c - med.med) AS d, x.id
        |       FROM x JOIN med ON x.t = med.t),
        |r2 AS (SELECT *, row_number() OVER
        |      (PARTITION BY t ORDER BY d, id) AS rn,
        |    CAST(count(*) OVER (PARTITION BY t) AS BIGINT) AS n FROM dv),
        |mad AS (SELECT t, min(CASE WHEN 2 * rn >= n THEN d END) AS mad
        |        FROM r2 GROUP BY t)
        |SELECT med.t AS event_type, med.n, med.med AS med_cents,
        |  mad.mad AS mad_cents,
        |  CAST(sum(CASE WHEN abs(x.c - med.med) > 3 * mad.mad
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM x JOIN med ON x.t = med.t JOIN mad ON x.t = mad.t
        |GROUP BY med.t, med.n, med.med, mad.mad
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val x = Tables(s, dir, "events")
        .select(col("event_type").as("t"),
          floor(col("value") * 100).cast("long").as("v"),
          col("event_id").as("id"))
      Dedup.withScratch(x) {
        def lowerMedian(df: org.apache.spark.sql.DataFrame, as: String) =
          typedRank(df).groupBy(col("t"), col("n"))
            .agg(min(when(lit(2) * col("rnw") >= col("n"), col("v")))
              .as(as))
        val med = lowerMedian(x, "med")
        val dv = x.join(broadcast(med), "t")
          .select(col("t"), abs(col("v") - col("med")).as("v"), col("id"))
        val mad = lowerMedian(dv, "mad").drop("n")
        x.join(broadcast(med), "t").join(broadcast(mad), "t")
          .groupBy(col("t"), col("n"), col("med"), col("mad"))
          .agg(sum(when(abs(col("v") - col("med")) > lit(3) * col("mad"),
            1L).otherwise(0L)).as("n_outliers"))
          .select(col("t").as("event_type"), col("n"),
            col("med").as("med_cents"), col("mad").as("mad_cents"),
            col("n_outliers"))
          .orderBy(col("event_type"))
      }
    },

    // ------------------------------------------------------------------
    // q205: Poisson-bootstrap error bars — resampling inference for a
    // corpus statistic (mean tokens per document) computed EXACTLY and
    // deterministically: replica r draws each doc with weight
    // w = Poisson(1) via the inverse CDF on the doc's md5-16-bit
    // uniform keyed (doc_id, r) — fixed integer thresholds, identical
    // in both engines, so every replica is an exact integer pair
    // (Σw, Σw·n_tok) and its mean is ONE double division. This is how
    // a profile stat gets a confidence band at 100 TB without a second
    // scan per replica (Chamandy et al. '12, "Estimating Uncertainty
    // for Massive Data Streams"): the doc×replica expansion is a
    // scan-stage projection and map-side partials collapse the shuffle
    // to B=32 rows per task. Reading the spread of the 32 means IS the
    // error bar; the driver gate pins every replica exactly.
    QuerySpec.sqlBacked("q205_bootstrap_ci",
      """WITH d AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |x AS (SELECT rep,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |      CAST(rep AS VARCHAR)), 1, 4)) AS INTEGER) AS u, n_tok
        |  FROM d, unnest(range(0, 32)) AS t(rep)),
        |w AS (SELECT rep, n_tok, CASE
        |    WHEN u < 24109 THEN 0 WHEN u < 48219 THEN 1
        |    WHEN u < 60273 THEN 2 WHEN u < 64292 THEN 3
        |    WHEN u < 65296 THEN 4 ELSE 5 END AS w FROM x)
        |SELECT CAST(rep AS BIGINT) AS rep,
        |  CAST(sum(w) AS BIGINT) AS n_eff,
        |  CAST(sum(w * n_tok) AS BIGINT) AS sum_tok,
        |  CAST(CAST(sum(w * n_tok) AS BIGINT) AS DOUBLE)
        |    / greatest(CAST(sum(w) AS BIGINT), 1) AS mean_tok
        |FROM w GROUP BY rep ORDER BY rep""".stripMargin) { (s, dir) =>
      Tables.spread(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .select(col("doc_id"), col("n_tok"),
          explode(sequence(lit(0), lit(31))).as("rep"))
        .withColumn("u",
          conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
            col("rep").cast("string"))), 1, 4), 16, 10).cast("int"))
        .withColumn("w",
          when(col("u") < 24109, 0L).when(col("u") < 48219, 1L)
            .when(col("u") < 60273, 2L).when(col("u") < 64292, 3L)
            .when(col("u") < 65296, 4L).otherwise(5L))
        .groupBy(col("rep").cast("long").as("rep"))
        .agg(sum(col("w")).as("n_eff"),
          sum(col("w") * col("n_tok")).as("sum_tok"))
        .select(col("rep"), col("n_eff"), col("sum_tok"),
          (col("sum_tok").cast("double") /
            greatest(col("n_eff"), lit(1L))).as("mean_tok"))
        .orderBy(col("rep"))
    }
  )
}
