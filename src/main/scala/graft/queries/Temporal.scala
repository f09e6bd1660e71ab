package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins
import graft.sources.Tables

/** Temporal join queries over `events`: as-of (latest earlier partner
  * event) and bounded range (neighbors within a time window) — operators
  * the reference lacks, oracle-checked against DuckDB's native ASOF JOIN
  * and inequality join. The operator implementations live in
  * [[graft.operators.TemporalJoins]]; see there for the scale design.
  */
object Temporal {

  /** q138/q145's shared oracle body: the OBVIOUS attribution formulation
    * — a LEFT LATERAL top-1 probe per purchase, carrying the credited
    * channel AND the touch→purchase lag. One string so the two gates
    * prove the same frame (the flagCumQty/skewEdges anti-drift rule). */
  private lazy val attributionCtes =
    """e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
      |    event_type, CAST(floor(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type IN ('click', 'view', 'purchase')),
      |p AS (SELECT * FROM e WHERE event_type = 'purchase'),
      |t AS (SELECT * FROM e WHERE event_type <> 'purchase'),
      |a AS (SELECT p.event_id, p.cents,
      |        coalesce(l.event_type, 'direct') AS channel,
      |        epoch_us(p.ts) - l.tus AS lag_us
      |      FROM p LEFT JOIN LATERAL (
      |        SELECT t.event_type, epoch_us(t.ts) AS tus FROM t
      |        WHERE t.user_id = p.user_id
      |          AND (epoch_us(t.ts) < epoch_us(p.ts)
      |               OR (epoch_us(t.ts) = epoch_us(p.ts)
      |                   AND t.event_id < p.event_id))
      |          AND epoch_us(t.ts) >= epoch_us(p.ts) - 604800000000
      |        ORDER BY epoch_us(t.ts) DESC, t.event_id DESC
      |        LIMIT 1) l ON true)""".stripMargin

  /** q138/q145's shared Spark frame: per purchase, the credited channel,
    * revenue cents, and touch→purchase lag (NULL for 'direct') — the
    * SCALABLE union+window formulation (one user-keyed exchange carrying
    * the running latest touch; the lateral probe appears nowhere). Built
    * from the streaming twin's projection, so ledger ≡ batch cannot
    * drift either. */
  private def attributedPurchases(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = graft.streaming.IncrementalAttribution
      .observations(Tables(s, dir, "events"))
      .toDF("event_id", "user_id", "us", "event_type", "cents")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("touch",
        when(col("event_type") =!= "purchase",
          struct(col("us").as("tus"), col("event_id").as("tid"),
            col("event_type").as("tch"))))
      .withColumn("last_touch", max(col("touch")).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("channel",
        when(col("last_touch").isNull ||
          col("us") - col("last_touch.tus") > 604800000000L, "direct")
          .otherwise(col("last_touch.tch")))
      .withColumn("lag_us",
        when(col("channel") =!= "direct",
          col("us") - col("last_touch.tus")))
      .select(col("event_id"), col("cents"), col("channel"), col("lag_us"))
  }

  val specs: Seq[QuerySpec] = Seq(

    // ------------------------------------------------------------------
    // As-of join: each click gets the user's most recent view at or
    // before the click (sessionization's "attribute action to last
    // impression" primitive). (user_id, ts) is unique in the corpus, so
    // the as-of tiebreak is deterministic.
    QuerySpec.sqlBacked("q57_asof_join", asofOracleSql) { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_id"), col("value").as("view_value"))
      TemporalJoins.asof(clicks, views, "user_id", "ts",
          Seq("view_id", "view_value"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("view_id"), col("view_value"))
        .orderBy(col("event_id"))
    },

    // ------------------------------------------------------------------
    // Range join: per event, how many other events of the same user fall
    // within +-15 minutes (burst/abuse detection shape). Microsecond
    // bounds on both sides keep the boundary comparisons engine-exact.
    QuerySpec.sqlBacked("q58_range_join",
      """SELECT a.event_id, count(*) AS n_near
        |FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) a
        |JOIN (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) b
        |  ON a.user_id = b.user_id AND b.event_id != a.event_id
        | AND b.ts >= a.ts - INTERVAL 15 MINUTE
        | AND b.ts <= a.ts + INTERVAL 15 MINUTE
        |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      val other = ev.select(col("user_id"), col("ts"),
        col("event_id").as("b_id"))
      TemporalJoins.range(ev, other, "user_id", "ts",
          -15L * 60 * 1000000, 15L * 60 * 1000000, Seq("b_id"))
        .filter(col("b_id") =!= col("event_id"))
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_near"))
        .orderBy(col("event_id"))
    },

    // ------------------------------------------------------------------
    // Top-3 orders per customer via the bounded-heap TopKAgg aggregate
    // ([[graft.plans.TopKAgg]]): at most k rows per group cross the
    // shuffle, vs a ranking window's full per-group sort — the scale
    // path for top-k on skewed keys. DESC price is encoded by struct
    // ordering with the negated orderkey as ascending tiebreak. The
    // oracle states the same semantics as the window formulation.
    QuerySpec.sqlBacked("q64_topk_per_key",
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(graft.plans.TopKAgg(
          struct(col("o_totalprice").as("p"),
            (-col("o_orderkey")).as("nk")), 3).as("top"))
        .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "t")))
        .select(col("o_custkey"), (col("i") + 1).cast("long").as("rn"),
          (-col("t.nk")).as("o_orderkey"), col("t.p").as("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    // ------------------------------------------------------------------
    // Batch sessionization: per-user sessions cut at >=30 min of
    // inactivity — the gap-and-island pattern (new-session flags via
    // lag, running sum numbers the islands), then one aggregate per
    // session. ONE shuffle keyed by user_id; parallelism = users, and
    // every comparison is integer microseconds so the session cuts are
    // engine-exact. (The streaming twin is GWindows.session / q28; this
    // is the batch/backfill form a pipeline runs over history.) The cut
    // is >= gap, matching session_window / Flink session semantics
    // (windows are [ts, ts+gap) half-open, merged on strict overlap):
    // two events EXACTLY 30 min apart start separate sessions, so
    // SessionParitySpec's batch==engine equality holds by construction,
    // not corpus luck.
    QuerySpec.sqlBacked("q76_sessionize",
      """WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
        |           FROM events),
        |s AS (SELECT user_id, event_id, ts,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |               OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
        |                  >= 1800000000 THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id
        |                          ORDER BY ts, event_id)),
        |c AS (SELECT user_id, event_id, ts,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING) AS sess_no
        |      FROM s)
        |SELECT user_id, CAST(sess_no AS BIGINT) AS session_id,
        |       count(*) AS n_events, min(ts) AS start_ts, max(ts) AS end_ts,
        |       CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT)
        |         AS duration_us
        |FROM c GROUP BY user_id, sess_no
        |ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = wOrd.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      val prev = lag(col("ts"), 1).over(wOrd)
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("brk",
          when(prev.isNull ||
            unix_micros(col("ts")) - unix_micros(prev) >= 1800000000L, 1)
            .otherwise(0))
        .withColumn("sess_no", sum(col("brk")).over(wRun))
        .groupBy(col("user_id"), col("sess_no"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
        .select(col("user_id"), col("sess_no").cast("long").as("session_id"),
          col("n_events"), col("start_ts"), col("end_ts"),
          (unix_micros(col("end_ts")) - unix_micros(col("start_ts")))
            .as("duration_us"))
        .orderBy(col("user_id"), col("session_id"))
    },

    // ------------------------------------------------------------------
    // Event-type transition counts (first-order Markov matrix): for
    // each user's time-ordered stream, count (event_type -> next
    // event_type) bigrams across the corpus — the funnel/behavior-model
    // input. lead() over the same per-user shuffle as q76, then one
    // tiny aggregate on the (from, to) pair.
    QuerySpec.sqlBacked("q77_transitions",
      """WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
        |           FROM events),
        |p AS (SELECT event_type,
        |        lead(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS next_type
        |      FROM e)
        |SELECT event_type, next_type, count(*) AS n
        |FROM p WHERE next_type IS NOT NULL
        |GROUP BY event_type, next_type
        |ORDER BY event_type, next_type""".stripMargin) { (s, dir) =>
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(wOrd))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("next_type"))
    },

    // ------------------------------------------------------------------
    // Time-series resample + gap fill: each user's event stream on a
    // dense hourly grid over their own active span, empty hours at
    // n_events = 0 carrying the last observed hourly max forward
    // (last_value IGNORE NULLS) — the feature-pipeline step turning
    // irregular events into fixed-step model inputs. The grid explodes
    // per user (no driver-side calendar), the fill is a per-user
    // running window: one shuffle keyed by user, parallelism = users.
    // The filled metric is an hourly MAX, not a sum/avg — max is
    // accumulation-order-free, so the fill is engine-exact.
    QuerySpec.sqlBacked("q84_gapfill_resample",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |span AS (SELECT user_id, date_trunc('hour', min(ts)) AS h0,
        |                date_trunc('hour', max(ts)) AS h1
        |         FROM e GROUP BY user_id),
        |grid AS (SELECT user_id,
        |           unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
        |         FROM span),
        |agg AS (SELECT user_id, date_trunc('hour', ts) AS hr,
        |          count(*) AS n, max(value) AS mx
        |        FROM e GROUP BY user_id, hr)
        |SELECT g.user_id, g.hr, COALESCE(n, 0) AS n_events,
        |  last_value(mx IGNORE NULLS) OVER (PARTITION BY g.user_id
        |    ORDER BY g.hr ROWS UNBOUNDED PRECEDING) AS filled
        |FROM grid g LEFT JOIN agg a
        |  ON g.user_id = a.user_id AND g.hr = a.hr
        |ORDER BY g.user_id, g.hr""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("value"))
      val grid = e.groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("h0"),
          date_trunc("hour", max(col("ts"))).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"),
            expr("interval 1 hour"))).as("hr"))
      val agg = e.groupBy(col("user_id"),
          date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"), max(col("value")).as("mx"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("hr"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      grid.join(agg, Seq("user_id", "hr"), "left")
        .select(col("user_id"), col("hr"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          last(col("mx"), ignoreNulls = true).over(w).as("filled"))
        .orderBy(col("user_id"), col("hr"))
    },

    // ------------------------------------------------------------------
    // Top-k per time bucket (daily most-active users): the trending /
    // leaderboard shape. Counts per (day, user), then the bounded-heap
    // TopKAgg keeps 3 per day — at most k rows per bucket cross the
    // final shuffle, vs a ranking window's full per-day sort (q64's
    // scale argument, applied to a time axis).
    QuerySpec.sqlBacked("q93_daily_top_users",
      """WITH c AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |           AS day, user_id, count(*) AS cnt
        |  FROM events GROUP BY day, user_id)
        |SELECT day, rk, user_id, cnt FROM (
        |  SELECT day, user_id, cnt,
        |    CAST(row_number() OVER (PARTITION BY day
        |      ORDER BY cnt DESC, user_id) AS BIGINT) AS rk
        |  FROM c)
        |WHERE rk <= 3 ORDER BY day, rk""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"),
          col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("day"))
        .agg(graft.plans.TopKAgg(
          struct(col("cnt").as("c"), (-col("user_id")).as("nu")), 3).as("top"))
        .select(col("day"), posexplode(col("top")).as(Seq("i", "t")))
        .select(col("day"), (col("i") + 1).cast("long").as("rk"),
          (-col("t.nu")).as("user_id"), col("t.c").as("cnt"))
        .orderBy(col("day"), col("rk"))
    },

    // ------------------------------------------------------------------
    // Cohort retention: users grouped by first-activity day, active-user
    // counts per day offset — the engagement matrix behind every
    // retention curve. The cohort assignment is a per-user min (one
    // shuffle keyed by user), the matrix one aggregate over (cohort,
    // offset); day arithmetic is integer, so the cells are engine-exact.
    QuerySpec.sqlBacked("q94_cohort_retention",
      """WITH e AS (SELECT user_id,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
        |  FROM events),
        |c AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY user_id)
        |SELECT cohort, datediff('day', cohort, day) AS offset_days,
        |       count(DISTINCT e.user_id) AS active_users
        |FROM e JOIN c ON e.user_id = c.user_id
        |GROUP BY cohort, offset_days
        |ORDER BY cohort, offset_days""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast("date").as("day"))
      val c = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
      e.join(c, "user_id")
        .groupBy(col("cohort"),
          datediff(col("day"), col("cohort")).cast("long").as("offset_days"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy(col("cohort"), col("offset_days"))
    },

    // ------------------------------------------------------------------
    // Ordered funnel (view -> click -> purchase within a session): how
    // many q76 sessions reach each stage, each stage's event strictly
    // after the previous stage's FIRST occurrence. Three grouped
    // aggregates over one sessionized base (scratch-cached — each
    // stage's "first ts" feeds the next stage's filter); all
    // comparisons are on exact microsecond timestamps. One-row output.
    QuerySpec.sqlBacked("q95_session_funnel",
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    CAST(ts AS TIMESTAMP) AS ts FROM events),
        |s AS (SELECT user_id, event_id, event_type, ts,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |               OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
        |                  >= 1800000000 THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id
        |                          ORDER BY ts, event_id)),
        |b AS (SELECT user_id, event_type, ts,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING) AS sess
        |      FROM s),
        |v AS (SELECT user_id, sess, min(ts) AS t_view FROM b
        |      WHERE event_type = 'view' GROUP BY user_id, sess),
        |c AS (SELECT b.user_id, b.sess, min(ts) AS t_click
        |      FROM b JOIN v ON b.user_id = v.user_id AND b.sess = v.sess
        |      WHERE event_type = 'click' AND ts > t_view
        |      GROUP BY b.user_id, b.sess),
        |p AS (SELECT b.user_id, b.sess, min(ts) AS t_purchase
        |      FROM b JOIN c ON b.user_id = c.user_id AND b.sess = c.sess
        |      WHERE event_type = 'purchase' AND ts > t_click
        |      GROUP BY b.user_id, b.sess)
        |SELECT
        |  (SELECT count(DISTINCT (user_id, sess)) FROM b) AS n_sessions,
        |  (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_view_click,
        |  (SELECT count(*) FROM p) AS n_view_click_purchase""".stripMargin) {
      (s, dir) =>
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = wOrd.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      val prev = lag(col("ts"), 1).over(wOrd)
      val b = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        .withColumn("brk",
          when(prev.isNull ||
            unix_micros(col("ts")) - unix_micros(prev) >= 1800000000L, 1)
            .otherwise(0))
        .withColumn("sess", sum(col("brk")).over(wRun))
        .select(col("user_id"), col("event_type"), col("ts"), col("sess"))
      Dedup.withScratch(b) {
        val v = b.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("sess"))
          .agg(min(col("ts")).as("t_view"))
        val cl = b.filter(col("event_type") === "click")
          .join(v, Seq("user_id", "sess"))
          .filter(col("ts") > col("t_view"))
          .groupBy(col("user_id"), col("sess"))
          .agg(min(col("ts")).as("t_click"))
        val p = b.filter(col("event_type") === "purchase")
          .join(cl, Seq("user_id", "sess"))
          .filter(col("ts") > col("t_click"))
          .groupBy(col("user_id"), col("sess"))
          .agg(min(col("ts")).as("t_purchase"))
        b.select(col("user_id"), col("sess")).distinct()
          .agg(count(lit(1)).as("n_sessions"))
          .crossJoin(broadcast(v.agg(count(lit(1)).as("n_view"))))
          .crossJoin(broadcast(cl.agg(count(lit(1)).as("n_view_click"))))
          .crossJoin(broadcast(
            p.agg(count(lit(1)).as("n_view_click_purchase"))))
      }
    },

    // ------------------------------------------------------------------
    // Per-user EWMA (alpha = 0.25) of event values — the time-decay
    // smoothing every online metric/feature store keeps per entity.
    // EWMA is an ORDERED fold, the one aggregation class where
    // accumulation order is semantic rather than a hazard: both engines
    // fold the SAME left-to-right recurrence ewma = 0.25*v + 0.75*ewma
    // (init = first value) over the same (ts, event_id)-sorted list,
    // and 0.25/0.75 are exact binary fractions, so the doubles
    // hash-match. Scale: ONE user-keyed shuffle; the fold runs inside a
    // codegen'd higher-order function over the per-user list — state is
    // bounded by per-entity history (the per-user contract every
    // time-series feature pipeline already has; an unbounded-history
    // entity needs the streaming form with running state instead).
    QuerySpec.sqlBacked("q113_ewma",
      """WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
        |           FROM events),
        |l AS (SELECT user_id, count(*) AS n_events,
        |        list(value ORDER BY ts, event_id) AS vs
        |      FROM e GROUP BY user_id)
        |SELECT user_id, n_events,
        |  list_reduce(vs, (acc, v) -> 0.25 * v + 0.75 * acc) AS ewma
        |FROM l ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          expr("sort_array(collect_list(struct(ts, event_id, value)))")
            .as("es"))
        .select(col("user_id"), col("n_events"),
          expr("transform(es, x -> x.value)").as("vs"))
        .select(col("user_id"), col("n_events"), expr(
          // list_reduce's contract: first element seeds the accumulator,
          // the rest fold left - mirrored exactly
          "aggregate(slice(vs, 2, size(vs) - 1), vs[0], (acc, v) -> 0.25 * v + 0.75 * acc)")
          .as("ewma"))
        .orderBy(col("user_id"))
    },

    // ------------------------------------------------------------------
    // Changelog compaction — the CDC/upsert snapshot: events is read as
    // a change stream keyed by user_id (each event an upsert of that
    // user's state), and the snapshot is last-write-wins per key with
    // tombstone semantics (a user whose LATEST change is an 'error'
    // event is dropped from the snapshot, not surfaced with stale
    // state). The (ts, event_id) ordering key makes the winner
    // deterministic even under µs-truncation ties. Scale: `max_by` over
    // a struct ordering key is a declarative aggregate with map-side
    // partials — each partition forwards ONE candidate row per key, so
    // the exchange carries |keys|×partials rows, vs the ranking-window
    // form (the oracle's formulation) which shuffles and SORTS every
    // change of every key — the difference between compacting a 100 TB
    // changelog and not. Cents via the q85 floor idiom (exact in both
    // engines).
    QuerySpec.sqlBacked("q116_changelog_compact",
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
        |             event_type,
        |             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |           FROM events),
        |r AS (SELECT *,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS rn,
        |        count(*) OVER (PARTITION BY user_id) AS n_changes
        |      FROM e)
        |SELECT user_id, ts AS last_ts, event_type AS last_type,
        |       cents AS last_cents, CAST(n_changes AS BIGINT) AS n_changes
        |FROM r WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_changes"),
          max_by(
            struct(col("ts"), col("event_type").as("et"),
              floor(col("value") * 100 + 0.5).cast("long").as("cents")),
            struct(col("ts"), col("event_id"))).as("last"))
        .filter(col("last.et") =!= "error")
        .select(col("user_id"), col("last.ts").as("last_ts"),
          col("last.et").as("last_type"), col("last.cents").as("last_cents"),
          col("n_changes"))
        .orderBy(col("user_id"))
    },

    // ------------------------------------------------------------------
    // Incremental aggregate maintenance — the materialized-view delta
    // pattern: a stored per-user aggregate STATE (everything before the
    // cutoff) is refreshed by merging the new period's PARTIAL, not by
    // rescanning history. count/sum/max are algebraic, so the merge is
    // the same combine the engine's map-side partials use — lifted to
    // storage: state ⊎ delta ≡ full recompute, and the oracle IS the
    // full recompute, so the equality is what the gate checks. Scale:
    // in production the state side is user-keyed rows (no event scan at
    // all) and the delta scan prunes to the new date partition; refresh
    // cost is O(delta + |keys|) forever, vs O(history) per refresh —
    // the only way a 100 TB event table gets a daily dashboard. (Both
    // sides scan-filter here because the test corpus is one table; the
    // filters are the partition-pruning predicates.)
    QuerySpec.sqlBacked("q117_incremental_agg",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |           FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(cents) AS BIGINT) AS cents, max(ts) AS last_ts
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      val cut = lit("2024-01-15").cast("timestamp")
      def partialAgg(df: DataFrame): DataFrame = df
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("cents"),
          max(col("ts")).as("last_ts"))
      val state = partialAgg(e.filter(col("ts") < cut))
      val delta = partialAgg(e.filter(col("ts") >= cut))
      state.unionByName(delta)
        .groupBy(col("user_id"))
        .agg(sum(col("n_events")).as("n_events"),
          sum(col("cents")).as("cents"),
          max(col("last_ts")).as("last_ts"))
        .orderBy(col("user_id"))
    },

    // ------------------------------------------------------------------
    // Table-diff reconciliation (Merkle-style bucket checksums): decide
    // WHERE two snapshots of a keyed table differ without joining them
    // row-by-row. Each snapshot reduces to 65536 bucket summaries
    // (count + bit_xor of a 60-bit per-row digest — xor is
    // order-independent and cannot overflow, count catches the
    // even-multiplicity blind spot xor alone has, and the unique key
    // inside the digest prevents within-bucket swap cancellation); only
    // buckets whose summaries disagree are drilled into with a
    // key-level outer join. Bucket count must be sized ABOVE the
    // expected diff cardinality or every bucket ends up touched and the
    // sliver degenerates to the full table (the first cut here used
    // 1024 buckets against ~4k drifted keys and the drill-down join
    // carried the whole snapshot - caught in the PLANS.md audit); 65536
    // holds the summary exchange at fixed KBs while keeping the probed
    // sliver proportional to the drift. At 100 TB: two scans reduced
    // map-side to 65536-row exchanges, then a full-width join over ONLY
    // the differing sliver — vs a sort-merge of both full tables, which is
    // the plan you cannot afford for a nightly replica audit. Snapshot
    // B is derived in-query with deterministic drift (deletes at
    // key%131, cent bumps at key%97, inserts cloned at key%113 with
    // offset keys); the ORACLE diffs the true payload columns directly
    // (no buckets, no digests), so the gate also proves the digest
    // protocol reproduces ground truth exactly — a digest collision or
    // a summary that misses a bucket would hash-mismatch.
    QuerySpec.sqlBacked("q124_table_diff",
      """WITH a AS (SELECT o_orderkey AS key, o_custkey AS cust,
        |             o_orderstatus AS status,
        |             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |           FROM orders),
        |b AS (SELECT key, cust, status,
        |        cents + CASE WHEN key % 97 = 0 THEN 1 ELSE 0 END AS cents
        |      FROM a WHERE key % 131 <> 0
        |      UNION ALL
        |      SELECT key + 10000000, cust, status, cents
        |      FROM a WHERE key % 113 = 0),
        |d AS (SELECT coalesce(a.key, b.key) AS key,
        |        CASE WHEN b.key IS NULL THEN 'deleted'
        |             WHEN a.key IS NULL THEN 'inserted'
        |             WHEN a.cust <> b.cust OR a.status <> b.status
        |                  OR a.cents <> b.cents THEN 'updated'
        |        END AS change
        |      FROM a FULL JOIN b ON a.key = b.key)
        |SELECT key, change FROM d WHERE change IS NOT NULL
        |ORDER BY key""".stripMargin) { (s, dir) =>
      val a = Tables(s, dir, "orders").select(
        col("o_orderkey").as("key"), col("o_custkey").as("cust"),
        col("o_orderstatus").as("status"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      val b = a.filter(col("key") % 131 =!= 0)
        .withColumn("cents",
          col("cents") + when(col("key") % 97 === 0, 1L).otherwise(0L))
        .unionByName(a.filter(col("key") % 113 === 0)
          .withColumn("key", col("key") + 10000000L))
      // 60-bit row digest: portable across engines (conv here,
      // CAST('0x'|| ...) in DuckDB would match — the oracle instead
      // compares true payloads, which is the stronger check)
      def digested(df: DataFrame): DataFrame = df.select(col("key"),
        expr("CAST(conv(substring(md5(concat_ws('|', key, cust, status, " +
          "cents)), 1, 15), 16, 10) AS BIGINT)").as("d"),
        (col("key") % 65536).as("bucket"))
      val (da, db) = (digested(a), digested(b))
      def summary(df: DataFrame): DataFrame = df.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(d)").as("x"))
      val diffBuckets = summary(da).as("sa")
        .join(summary(db).as("sb"), Seq("bucket"), "full_outer")
        .filter(col("sa.n").isNull || col("sb.n").isNull ||
          col("sa.n") =!= col("sb.n") || col("sa.x") =!= col("sb.x"))
        .select(col("bucket"))
      // drill-down: only rows whose bucket summary disagreed
      val sliverA = da.join(broadcast(diffBuckets), "bucket")
        .select(col("key").as("ka"), col("d").as("dda"))
      val sliverB = db.join(broadcast(diffBuckets), "bucket")
        .select(col("key").as("kb"), col("d").as("ddb"))
      sliverA.join(sliverB, col("ka") === col("kb"), "full_outer")
        .select(coalesce(col("ka"), col("kb")).as("key"),
          when(col("kb").isNull, "deleted")
            .when(col("ka").isNull, "inserted")
            .when(col("dda") =!= col("ddb"), "updated").as("change"))
        .filter(col("change").isNotNull)
        .orderBy(col("key"))
    },

    // ------------------------------------------------------------------
    // Group-wise OLS trend: per-user least-squares slope of spend over
    // time (drift / churn-risk scoring) — regression as ONE algebraic
    // aggregate. The closed form slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)
    // needs only five map-side-combinable sums per key, so the shuffle
    // carries fixed-size partials (the same economics as q117's
    // monoids) — never the points; a per-key sort or window appears
    // nowhere. Determinism doctrine: x = whole days since 2024-01-01,
    // y = cents — numerator and denominator are EXACT BIGINTs (emitted
    // for the hash gate), and the one double division at the end is
    // IEEE-defined on identical operands, so even the slope matches
    // bit-for-bit. Engines' regr_slope would run the same math in
    // floating point per partial — order-dependent, un-oracle-able.
    QuerySpec.sqlBacked("q126_groupwise_trend",
      """WITH e AS (SELECT user_id,
        |    CAST(datediff('day', TIMESTAMP '2024-01-01',
        |                  CAST(ts AS TIMESTAMP)) AS BIGINT) AS x,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
        |  FROM events),
        |s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |        CAST(sum(x*y) AS BIGINT) AS sxy,
        |        CAST(sum(x*x) AS BIGINT) AS sxx
        |      FROM e GROUP BY user_id)
        |SELECT user_id, n, n*sxy - sx*sy AS slope_num,
        |       n*sxx - sx*sx AS slope_den,
        |       CASE WHEN n*sxx - sx*sx = 0 THEN NULL
        |            ELSE CAST(n*sxy - sx*sy AS DOUBLE)
        |                 / CAST(n*sxx - sx*sx AS DOUBLE)
        |       END AS slope_cents_per_day
        |FROM s ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("2024-01-01")).cast("long")
            .as("x"),
          floor(col("value") * 100 + 0.5).cast("long").as("y"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("user_id"), col("n"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
        .withColumn("slope_cents_per_day",
          when(col("slope_den") === 0, lit(null).cast("double"))
            .otherwise(col("slope_num").cast("double") /
              col("slope_den").cast("double")))
        .orderBy(col("user_id"))
    },

    // ------------------------------------------------------------------
    // Distribution drift (total-variation distance): how far did each
    // event type's spend distribution move across the 2024-01-15
    // cutoff — the data-drift monitor a pipeline runs between snapshots
    // before trusting a model trained on the old one. TV distance
    // = ½·Σ|p_i − q_i| over $25 buckets, computed as EXACT integers:
    // Σ|n_i·M − m_i·N| / (2·N·M) — no logs (PSI/KL need libm, whose
    // rounding diverges across engines — the q112/q123 doctrine), and
    // the numerator/denominator are emitted for the hash gate with the
    // one double division last. Shape: ONE scan with both periods
    // counted map-side per (type, bucket) — never two scans of the
    // fact — then bucket-space-sized joins. Counts here fit BIGINT
    // (products ≤ rows²); a true 100 TB run lifts the products to
    // DECIMAL(38,0) — same plan, wider lanes.
    QuerySpec.sqlBacked("q128_distribution_drift",
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) // 2500 AS bucket,
        |    CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15' AS pa
        |  FROM events),
        |g AS (SELECT event_type, bucket,
        |    CAST(count(*) FILTER (WHERE pa) AS BIGINT) AS na,
        |    CAST(count(*) FILTER (WHERE NOT pa) AS BIGINT) AS nb
        |  FROM e GROUP BY event_type, bucket),
        |t AS (SELECT event_type, CAST(sum(na) AS BIGINT) AS n_a,
        |        CAST(sum(nb) AS BIGINT) AS n_b
        |      FROM g GROUP BY event_type)
        |SELECT g.event_type, n_a, n_b,
        |  CAST(sum(abs(na * n_b - nb * n_a)) AS BIGINT) AS tv_num,
        |  2 * n_a * n_b AS tv_den,
        |  CAST(CAST(sum(abs(na * n_b - nb * n_a)) AS BIGINT) AS DOUBLE)
        |    / CAST(2 * n_a * n_b AS DOUBLE) AS tv
        |FROM g JOIN t ON g.event_type = t.event_type
        |GROUP BY g.event_type, n_a, n_b
        |ORDER BY g.event_type""".stripMargin) { (s, dir) =>
      val cut = lit("2024-01-15").cast("timestamp")
      val g = Tables(s, dir, "events")
        .select(col("event_type"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 2500")
            .as("bucket"),
          (col("ts") < cut).as("pa"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(when(col("pa"), 1)).as("na"),
          count(when(!col("pa"), 1)).as("nb"))
      val t = g.groupBy(col("event_type"))
        .agg(sum(col("na")).as("n_a"), sum(col("nb")).as("n_b"))
      g.join(t, "event_type")
        .groupBy(col("event_type"), col("n_a"), col("n_b"))
        .agg(sum(abs(col("na") * col("n_b") - col("nb") * col("n_a")))
          .as("tv_num"))
        .select(col("event_type"), col("n_a"), col("n_b"), col("tv_num"),
          (lit(2L) * col("n_a") * col("n_b")).as("tv_den"))
        .withColumn("tv",
          col("tv_num").cast("double") / col("tv_den").cast("double"))
        .orderBy(col("event_type"))
    },

    // ------------------------------------------------------------------
    // q133: SCD2 (slowly-changing-dimension type 2) history construction
    // — the warehouse primitive that turns an append-only changelog into
    // versioned [valid_from, valid_to) intervals. Treating events as a
    // per-user attribute changelog (event_type = the tracked status,
    // (ts, event_id) the total change order): collapse consecutive
    // repeats of the same status, stamp each surviving change with the
    // next change's timestamp as its expiry, NULL expiry = the current
    // row. Complements q116 (changelog → latest snapshot): same input
    // contract, full history instead of the head. Scale shape: both
    // windows are PARTITIONED BY user_id — per-partition work is bounded
    // by per-entity history (the q113/q116 per-user contract), one hash
    // exchange on user_id shared by both window stages and no global
    // sort anywhere; the final ORDER BY is presentation-only.
    QuerySpec.sqlBacked("q133_scd2_history",
      """WITH e AS (SELECT user_id, event_type AS status, event_id,
        |             CAST(ts AS TIMESTAMP) AS ts FROM events),
        |o AS (SELECT *, lag(status) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |      FROM e),
        |c AS (SELECT user_id, status, ts AS valid_from, event_id
        |      FROM o WHERE prev IS NULL OR status <> prev)
        |SELECT user_id, status, valid_from,
        |  lead(valid_from) OVER w AS valid_to,
        |  (lead(valid_from) OVER w IS NULL) AS is_current,
        |  CAST(row_number() OVER w AS BIGINT) AS version
        |FROM c WINDOW w AS
        |  (PARTITION BY user_id ORDER BY valid_from, event_id)
        |ORDER BY user_id, version""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val byChange = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val byVersion = Window.partitionBy(col("user_id"))
        .orderBy(col("valid_from"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_type").as("status"),
          col("event_id"), col("ts"))
        .withColumn("prev", lag(col("status"), 1).over(byChange))
        .filter(col("prev").isNull || col("status") =!= col("prev"))
        .select(col("user_id"), col("status"),
          col("ts").as("valid_from"), col("event_id"))
        .select(col("user_id"), col("status"), col("valid_from"),
          lead(col("valid_from"), 1).over(byVersion).as("valid_to"),
          lead(col("valid_from"), 1).over(byVersion).isNull.as("is_current"),
          row_number().over(byVersion).cast("long").as("version"))
        .orderBy(col("user_id"), col("version"))
    },

    // ------------------------------------------------------------------
    // q135: trailing-window time-series features — per (user, day), the
    // day's spend plus the 7-day trailing sum and active-day count, the
    // feature-engineering shape every churn/LTV pipeline materializes.
    // This is the one window class the inventory lacked: a RANGE frame
    // over event-time (gaps count — a user inactive for 5 of the 7 days
    // aggregates only the 2 active rows), where a ROWS frame would be
    // wrong exactly when activity is sparse. Day = integer epoch-day
    // (unix seconds div 86400 — floor on positive epochs, identical in
    // both engines); cents = floor(value*100) (the q131 projection), so
    // the frame sums are exact BIGINTs. Scale: daily pre-aggregation
    // with map-side partials first (the exchange carries |user×day|
    // rows, not events), then the window PARTITIONED BY user — per-
    // partition work bounded by per-entity history (the q113/q133
    // contract); no global sort anywhere.
    QuerySpec.sqlBacked("q135_rolling_features",
      """WITH e AS (SELECT user_id,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400
        |      AS day,
        |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |d AS (SELECT user_id, day, CAST(sum(cents) AS BIGINT) AS day_cents
        |      FROM e GROUP BY user_id, day)
        |SELECT user_id, day, day_cents,
        |  CAST(sum(day_cents) OVER w AS BIGINT) AS t7_cents,
        |  CAST(count(*) OVER w AS BIGINT) AS t7_days
        |FROM d WINDOW w AS (PARTITION BY user_id ORDER BY day
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, day""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // literally the streaming twin's projection (drift-proof sharing)
      val d = graft.streaming.IncrementalFeatures
        .observations(Tables(s, dir, "events"))
        .toDF("user_id", "day", "cents")
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("day_cents"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rangeBetween(-6, Window.currentRow)
      d.select(col("user_id"), col("day"), col("day_cents"),
          sum(col("day_cents")).over(w).as("t7_cents"),
          count(lit(1)).over(w).cast("long").as("t7_days"))
        .orderBy(col("user_id"), col("day"))
    },

    // ------------------------------------------------------------------
    // q138: last-touch conversion attribution — every purchase credits
    // the most recent preceding click/view by the same user within 7
    // days, else the 'direct' bucket; revenue rolls up per channel. The
    // marketing-warehouse staple, and a second consumer of the as-of
    // shape (q57): the Spark side is the SCALABLE formulation — one
    // union of touches and purchases, one user-keyed window carrying
    // the running latest touch (max over a preceding-rows frame of a
    // (ts, event_id, type) struct; nulls for purchase rows are skipped
    // by max) — while the oracle is the OBVIOUS formulation, a LATERAL
    // top-1 probe per purchase that DuckDB can afford at test SF. The
    // gate proving both equal is the point: the per-purchase lateral
    // lookup is quadratic-ish at 100 TB, the union+window form is one
    // exchange, per-entity bounded. Total order (ts µs, event_id)
    // breaks same-timestamp ties identically in both engines; the
    // 7-day cutoff compares exact epoch-µs BIGINTs.
    QuerySpec.sqlBacked("q138_attribution",
      s"""WITH $attributionCtes
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
        |       CAST(sum(cents) AS BIGINT) AS cents
        |FROM a GROUP BY channel ORDER BY channel""".stripMargin) { (s, dir) =>
      attributedPurchases(s, dir)
        .groupBy(col("channel"))
        .agg(count(lit(1)).cast("long").as("n_purchases"),
          sum(col("cents")).as("cents"))
        .orderBy(col("channel"))
    },

    // ------------------------------------------------------------------
    // q145: conversion-lag distribution — per channel, HOW LONG after
    // the credited touch do purchases land: the median touch→purchase
    // lag, the time-to-convert number a growth team reads next to
    // q138's revenue split. Built on the SAME attributed frame as q138
    // (one helper, one oracle CTE chain — the flagCumQty/skewEdges
    // anti-drift doctrine), then the median lag per channel is the
    // q143 crossing-row selection on a PrefixSum-stamped frame: one
    // range shuffle, channel offsets from a 2-row aggregate, argmin
    // struct — the per-channel serialized window the oracle runs
    // appears nowhere.
    QuerySpec.sqlBacked("q145_conversion_lag",
      s"""WITH $attributionCtes,
        |a2 AS (SELECT event_id, channel, lag_us FROM a
        |       WHERE channel <> 'direct'),
        |c AS (SELECT *, sum(1) OVER (PARTITION BY channel
        |        ORDER BY lag_us, event_id ROWS UNBOUNDED PRECEDING) AS cw,
        |      count(*) OVER (PARTITION BY channel) AS tw FROM a2),
        |m AS (SELECT channel, tw, lag_us, row_number() OVER
        |        (PARTITION BY channel ORDER BY lag_us, event_id) AS rn
        |      FROM c WHERE 2 * cw >= tw)
        |SELECT channel, CAST(tw AS BIGINT) AS n_conversions,
        |       lag_us AS median_lag_us
        |FROM m WHERE rn = 1 ORDER BY channel""".stripMargin) { (s, dir) =>
      val a = attributedPurchases(s, dir)
        .filter(col("channel") =!= "direct")
        .select(col("channel"), col("lag_us"), col("event_id"))
        .withColumn("w", lit(1L))
      val cum = graft.operators.PrefixSum.inclusive(a,
        Seq(col("channel"), col("lag_us"), col("event_id")), "w", "cum")
      val offs = a.groupBy(col("channel")).agg(sum(col("w")).as("tw"))
        .withColumn("off", coalesce(
          sum(col("tw")).over(org.apache.spark.sql.expressions.Window
            .orderBy(col("channel"))
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, -1)), lit(0L)))
      cum.join(broadcast(offs), "channel")
        .filter(lit(2) * (col("cum") - col("off")) >= col("tw"))
        .groupBy(col("channel"), col("tw"))
        .agg(min(struct(col("lag_us"), col("event_id"))).as("m"))
        .select(col("channel"), col("tw").as("n_conversions"),
          col("m.lag_us").as("median_lag_us"))
        .orderBy(col("channel"))
    },

    // ------------------------------------------------------------------
    // q139: session path mining — the top 15 three-step behavioral
    // paths (event-type trigrams WITHIN a session), the sequence-mining
    // step between q77's first-order transition matrix and a full
    // funnel model: "what do users actually do in a sitting" as data,
    // not hypothesis. Sessions are q76's 30-minute-gap rule verbatim
    // (one shared per-user exchange shape); each session's ordered type
    // sequence folds to trigrams with the q106 index-window idiom, the
    // path histogram is a tiny keyed aggregate, and the top-15 cut is
    // sort+limit = TakeOrderedAndProject (per-partition heads, never a
    // global window), deterministic under the total order (count DESC,
    // path ASC). Per-session lists are per-entity bounded (the q113
    // contract); nothing else leaves aggregate state.
    QuerySpec.sqlBacked("q139_session_paths",
      """WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
        |           FROM events),
        |s AS (SELECT user_id, event_id, ts, event_type,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |               OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
        |                  >= 1800000000 THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id
        |                          ORDER BY ts, event_id)),
        |c AS (SELECT user_id, event_id, ts, event_type,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING) AS sess_no
        |      FROM s),
        |l AS (SELECT user_id, sess_no,
        |        list(event_type ORDER BY ts, event_id) AS tys
        |      FROM c GROUP BY user_id, sess_no),
        |p AS (SELECT tys[i] || '>' || tys[i+1] || '>' || tys[i+2] AS path
        |      FROM l, unnest(range(1, len(tys) - 1)) AS t(i)
        |      WHERE len(tys) >= 3)
        |SELECT path, CAST(count(*) AS BIGINT) AS n
        |FROM p GROUP BY path ORDER BY n DESC, path LIMIT 15""".stripMargin) {
      (s, dir) =>
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = wOrd.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      val prev = lag(col("ts"), 1).over(wOrd)
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"))
        .withColumn("brk",
          when(prev.isNull ||
            unix_micros(col("ts")) - unix_micros(prev) >= 1800000000L, 1)
            .otherwise(0))
        .withColumn("sess_no", sum(col("brk")).over(wRun))
        .groupBy(col("user_id"), col("sess_no"))
        .agg(expr("sort_array(collect_list(struct(ts, event_id, event_type)))")
          .as("es"))
        .select(expr("transform(es, x -> x.event_type)").as("tys"))
        .filter(size(col("tys")) >= 3)
        .select(explode(expr(
          """transform(sequence(0, size(tys) - 3),
            |  i -> concat(tys[i], '>', tys[i + 1], '>', tys[i + 2]))"""
            .stripMargin)).as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(15)
    },

    // ------------------------------------------------------------------
    // q160: interval-OVERLAP self-join — the third temporal-join shape
    // (asof q57 = latest-earlier point, range q58 = points in a fixed
    // window; here BOTH sides are intervals of varying width). Each
    // lineitem is in transit over [shipdate, shipdate + quantity days];
    // per supplier, count the pairs of shipments whose transit windows
    // intersect — the fleet-utilization / concurrent-exposure shape
    // every logistics or validity-window pipeline needs. Spark side is
    // operators.TemporalJoins.overlap: candidates from an equi-join on
    // (supplier, 64-day bin), each true pair emitted exactly ONCE by
    // the max-start-bin rule (no distinct cleanup), exchanges carry
    // endpoints + ids only. The oracle runs the OBVIOUS per-key
    // inequality self-join DuckDB can afford at test SF — quadratic per
    // key, exactly the plan the binned form exists to avoid at 100 TB.
    // Quantity → days uses floor() in both engines (CAST in DuckDB
    // rounds-half-up where Spark's truncates — the q112/q123 doctrine).
    QuerySpec.sqlBacked("q160_interval_overlap",
      """WITH i AS (SELECT l_suppkey AS k,
        |    l_orderkey * 10 + l_linenumber AS id,
        |    epoch_us(CAST(l_shipdate AS TIMESTAMP)) AS s0,
        |    epoch_us(CAST(l_shipdate AS TIMESTAMP))
        |      + CAST(floor(l_quantity) AS BIGINT) * 86400000000 AS e0
        |  FROM lineitem)
        |SELECT a.k AS suppkey, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM i a JOIN i b
        |  ON a.k = b.k AND a.id < b.id AND a.s0 <= b.e0 AND b.s0 <= a.e0
        |GROUP BY a.k ORDER BY suppkey""".stripMargin) { (s, dir) =>
      val i = transitIntervals(s, dir)
      TemporalJoins.overlap(i,
          i.select(col("k"), col("s0").as("bs0"), col("e0").as("be0"),
            col("id").as("bid")),
          "k", "s0", "e0", "bs0", "be0",
          64L * 86400000000L, Seq("bid"))
        .filter(col("id") < col("bid"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_pairs"))
        .select(col("k").as("suppkey"), col("n_pairs"))
        .orderBy(col("suppkey"))
    },

    // ------------------------------------------------------------------
    // q161: peak interval concurrency — the AGGREGATE companion to
    // q160's pair enumeration: per supplier, the maximum number of
    // shipments simultaneously in transit, by the classic sweep (+1 at
    // each start, −1 just past each inclusive end, running sum, max).
    // Within one timestamp all +1s land before −1s (ORDER BY t, delta
    // DESC — a fixed rule, identical in both engines, and the max is
    // insensitive to order WITHIN an equal-(t, delta) run since those
    // deltas are equal). The per-supplier window is per-entity bounded
    // (the q113 contract: 2·|shipments per supplier| events), one keyed
    // exchange, no pair materialization at all — where q160's output is
    // Σ|pairs|, this is the O(n log n) summary a capacity planner
    // actually reads.
    QuerySpec.sqlBacked("q161_peak_concurrency",
      """WITH i AS (SELECT l_suppkey AS k,
        |    epoch_us(CAST(l_shipdate AS TIMESTAMP)) AS s0,
        |    epoch_us(CAST(l_shipdate AS TIMESTAMP))
        |      + CAST(floor(l_quantity) AS BIGINT) * 86400000000 AS e0
        |  FROM lineitem),
        |d AS (SELECT k, s0 AS t, 1 AS delta FROM i
        |      UNION ALL SELECT k, e0 + 1, -1 FROM i),
        |r AS (SELECT k, sum(delta) OVER (PARTITION BY k
        |        ORDER BY t, delta DESC ROWS UNBOUNDED PRECEDING) AS c
        |      FROM d)
        |SELECT k AS suppkey, CAST(max(c) AS BIGINT) AS peak
        |FROM r GROUP BY k ORDER BY suppkey""".stripMargin) { (s, dir) =>
      val i = transitIntervals(s, dir)
      val d = i.select(col("k"), col("s0").as("t"), lit(1L).as("delta"))
        .unionAll(i.select(col("k"), (col("e0") + 1L).as("t"),
          lit(-1L).as("delta")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("t"), col("delta").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      d.select(col("k"), sum(col("delta")).over(w).as("c"))
        .groupBy(col("k"))
        .agg(max(col("c")).as("peak"))
        .select(col("k").as("suppkey"), col("peak"))
        .orderBy(col("suppkey"))
    },

    // ------------------------------------------------------------------
    // q165: nearest-context join — for each purchase, the click/view by
    // the same user CLOSEST in time within ±1 hour, either direction
    // (q138 credits only the preceding touch; the sensor-fusion /
    // context-attach shape wants the nearest, which pandas ships as
    // merge_asof direction='nearest'). Spark side is
    // TemporalJoins.nearest: ONE union + ONE keyed sort computes both
    // direction candidates as two window passes over the same exchange
    // — no candidate pairs, no per-purchase probe. Backward wins
    // distance ties (deterministic, the operator's documented rule);
    // touches are pre-deduped per (user, ts) keeping the max event_id
    // (the operator's right-uniqueness precondition — oracle applies
    // the identical rule). The oracle is the OBVIOUS lateral nearest-1
    // probe, quadratic-ish per user at scale — the gate proving the
    // one-exchange form equals it is the point, exactly q138's pattern.
    QuerySpec.sqlBacked("q165_nearest_context", nearestOracleSql) {
      (s, dir) =>
      val p = Tables(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      TemporalJoins.nearest(p, dedupedTouches(s, dir), "user_id", "ts",
          Seq("channel"), 3600000000L)
        .select(col("event_id"),
          coalesce(col("channel"), lit("none")).as("channel"),
          col("gap_us"))
        .orderBy(col("event_id"))
    },

    // ------------------------------------------------------------------
    // q169: the NATIVE as-of join — q57's exact question answered by
    // the library's first whole-operator extension (plans.AsofJoin:
    // custom LogicalPlan + SparkStrategy + physical sort-merge exec,
    // build-brief tier (c)) instead of the tier-(a) union+window
    // composition. Both entries hash against the SAME DuckDB ASOF JOIN
    // oracle text, so the driver gate is precisely the claim that the
    // custom physical operator is answer-identical to the composed
    // plan — while its plan carries no union null-padding and no
    // window buffering: two co-partitioned sorts at native width and a
    // single forward merge pass with one held payload row (the shape
    // every database's ASOF JOIN implements). See AsofJoinSpec for the
    // operator-level differentials (string keys, partition sweeps,
    // no-match nulls).
    QuerySpec.sqlBacked("q169_asof_native", asofOracleSql) { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_id"), col("value").as("view_value"))
      graft.plans.AsofJoin.join(clicks, views, "user_id", "ts",
          Seq("view_id", "view_value"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("view_id"), col("view_value"))
        .orderBy(col("event_id"))
    },

    // ------------------------------------------------------------------
    // q172: per-entity changepoint detection — for every user with ≥ 8
    // active days, the day that best splits their daily-spend history
    // into a before/after with maximal level shift: argmax over split
    // points i of |cum_i·n − total·i|, the cross-multiplied form of
    // |prefix mean − overall mean| (q164's KS trick at per-key
    // granularity — all-integer, so the winning split is
    // engine-identical; ties break to the earliest day). The behavioral
    // complement to q164's corpus-level drift: WHERE each entity's
    // behavior broke, the churn/anomaly-attribution feature. Daily
    // cents is q135's exact projection (shared via
    // IncrementalFeatures.observations, the anti-drift doctrine).
    // Scale: daily pre-aggregation shrinks the exchange to |user×day|,
    // then ONE user-partitioned window pass — per-partition work
    // bounded by per-entity history (the q113/q133 contract); the
    // argmax is a max-struct aggregate, no second window. The guard
    // fails loudly where total·n would leave Long (DuckDB errors on
    // BIGINT overflow; Spark must not silently wrap past it).
    QuerySpec.sqlBacked("q172_changepoint",
      """WITH e AS (SELECT user_id,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400
        |      AS day,
        |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |d AS (SELECT user_id, day, CAST(sum(cents) AS BIGINT) AS c
        |      FROM e GROUP BY user_id, day),
        |w AS (SELECT user_id, day, c,
        |    CAST(sum(c) OVER (PARTITION BY user_id ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS BIGINT) AS i,
        |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
        |    CAST(sum(c) OVER (PARTITION BY user_id) AS BIGINT) AS total
        |  FROM d),
        |s AS (SELECT user_id, day, i, n,
        |    abs(cum * n - total * i) AS disc FROM w WHERE n >= 8),
        |m AS (SELECT user_id, n AS n_days, day AS cp_day, i AS cp_i,
        |    disc, row_number() OVER (PARTITION BY user_id
        |      ORDER BY disc DESC, i) AS rn FROM s)
        |SELECT user_id, n_days, cp_i, cp_day, disc
        |FROM m WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = graft.streaming.IncrementalFeatures
        .observations(Tables(s, dir, "events"))
        .toDF("user_id", "day", "cents")
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("c"))
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val wAll = Window.partitionBy(col("user_id"))
      d.select(col("user_id"), col("day"),
          sum(col("c")).over(wOrd).as("cum"),
          row_number().over(wOrd).cast("long").as("i"),
          count(lit(1)).over(wAll).cast("long").as("n"),
          sum(col("c")).over(wAll).as("total"))
        .filter(col("n") >= 8)
        // divide-compare guard (never multiply — the guard must not
        // wrap): |total|·n and cum·n inside Long keeps disc exact where
        // DuckDB's BIGINT arithmetic would ERROR instead
        .withColumn("n", when(
          greatest(abs(col("total")), abs(col("cum")))
            > expr("9000000000000000000L div n"),
          expr("raise_error('graft q172: |total| * n exceeds BIGINT " +
            "headroom - widen to DECIMAL')").cast("long"))
          .otherwise(col("n")))
        .select(col("user_id"), col("day"), col("i"), col("n"),
          abs(col("cum") * col("n") - col("total") * col("i")).as("disc"))
        .groupBy(col("user_id"), col("n").as("n_days"))
        .agg(max(struct(col("disc"), (-col("i")).as("ni"),
          col("day"))).as("m"))
        .select(col("user_id"), col("n_days"), (-col("m.ni")).as("cp_i"),
          col("m.day").as("cp_day"), col("m.disc").as("disc"))
        .orderBy(col("user_id"))
    },

    // ------------------------------------------------------------------
    // q174: the NATIVE nearest join — q165's exact question answered by
    // the physical ASOF operator in direction='nearest' with the ±1h
    // tolerance (plans.AsofJoin grew the full merge-asof direction
    // surface: backward / forward / nearest + tolerance). The exec's
    // single forward merge pass holds ONE backward payload row and
    // PEEKS the head as the forward candidate — no union null-padding,
    // no double window pass over the unioned frame (the tier-(a)
    // nearest pays both). Hashes against the SAME lateral-probe oracle
    // text as q165, so the driver gate is the answer-identity of all
    // three formulations: lateral top-1 (oracle), union+two-windows
    // (q165), native merge (this). Touches are pre-deduped per
    // (user, ts) — the operator's right-uniqueness precondition, same
    // helper as q165.
    QuerySpec.sqlBacked("q174_nearest_native", nearestOracleSql) {
      (s, dir) =>
      val p = Tables(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val touches = dedupedTouches(s, dir)
        .withColumn("rts_us", unix_micros(col("ts")))
      graft.plans.AsofJoin.join(p, touches, "user_id", "ts",
          Seq("channel", "rts_us"), direction = "nearest",
          toleranceUs = Some(3600000000L))
        .select(col("event_id"),
          coalesce(col("channel"), lit("none")).as("channel"),
          abs(unix_micros(col("ts")) - col("rts_us")).as("gap_us"))
        .orderBy(col("event_id"))
    },

    // ------------------------------------------------------------------
    // q179: the PRUNED native as-of — q169's join written the way a
    // user actually writes it: filter and narrow projection AFTER the
    // join, not hand-pushed into the inputs. Every custom logical node
    // is a barrier to Catalyst's ColumnPruning/PushDownPredicates, so
    // without plans.AsofPrune (the library's fourth optimizer rule)
    // this shape reads every event column on both sides and asof-joins
    // EVERY click before discarding 6/7 of them — at 100 TB the
    // difference between a two-column pushed-predicate scan and a
    // full-width full-corpus merge. The rule sinks the left-only
    // deterministic conjunct (user_id % 7 = 0) below the node and
    // prunes both children to the referenced columns plus join
    // key/ts (view_value is requested as payload, never read, and
    // vanishes from the right scan). The driver gate is answer-identity
    // with the rule firing; AsofPruneSpec pins the plan shape itself
    // (narrow ReadSchema, PushedFilters, payload predicates NOT pushed)
    // and the rule-off differential.
    QuerySpec.sqlBacked("q179_asof_pruned",
      """SELECT a.event_id, b.event_id AS view_id
        |FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events
        |      WHERE event_type = 'click' AND user_id % 7 = 0) a
        |ASOF LEFT JOIN
        |     (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events
        |      WHERE event_type = 'view') b
        |  ON a.user_id = b.user_id AND b.ts <= a.ts
        |ORDER BY a.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_id"), col("value").as("view_value"))
      graft.plans.AsofJoin.join(clicks, views, "user_id", "ts",
          Seq("view_id", "view_value"))
        .filter(col("user_id") % 7 === 0) // post-join: the rule's job
        .select(col("event_id"), col("view_id"))
        .orderBy(col("event_id"))
    },

    // ------------------------------------------------------------------
    // q185: the NATIVE overlap join — q160's exact question answered by
    // the library's SECOND whole-operator extension (plans.OverlapJoin:
    // per-key plane sweep over co-partitioned (key, start)-sorted
    // inputs). The binned tier-(a) form explodes both sides by 64-day
    // bins, shuffles the exploded frames, and de-duplicates multi-bin
    // pairs by the max-start-bin rule; the sweep does ONE merge pass
    // with the active-interval lists as its only state — no explosion,
    // no dedup, and no bin-width knob to re-fit when span distributions
    // drift. Both entries hash against the SAME per-key inequality
    // self-join oracle, so the driver gate is the answer-identity of
    // the two plans (the q169/q57 pattern). OverlapJoinSpec carries the
    // operator-level differentials (brute force, partition sweeps,
    // degenerate intervals, self-join exprIds).
    QuerySpec.sqlBacked("q185_overlap_native",
      """WITH i AS (SELECT l_suppkey AS k,
        |    l_orderkey * 10 + l_linenumber AS id,
        |    epoch_us(CAST(l_shipdate AS TIMESTAMP)) AS s0,
        |    epoch_us(CAST(l_shipdate AS TIMESTAMP))
        |      + CAST(floor(l_quantity) AS BIGINT) * 86400000000 AS e0
        |  FROM lineitem)
        |SELECT a.k AS suppkey, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM i a JOIN i b
        |  ON a.k = b.k AND a.id < b.id AND a.s0 <= b.e0 AND b.s0 <= a.e0
        |GROUP BY a.k ORDER BY suppkey""".stripMargin) { (s, dir) =>
      val i = transitIntervals(s, dir)
      graft.plans.OverlapJoin.join(i,
          i.select(col("k"), col("s0").as("bs0"), col("e0").as("be0"),
            col("id").as("bid")),
          "k", "s0", "e0", "bs0", "be0", Seq("bid"))
        .filter(col("id") < col("bid"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_pairs"))
        .select(col("k").as("suppkey"), col("n_pairs"))
        .orderBy(col("suppkey"))
    },

    // ------------------------------------------------------------------
    // q196: triangle communities — exact triangle counts and local
    // clustering coefficients over the user CO-INTERACTION graph (users
    // joined by >= 3 shared (event_type, hour) cells): the graph-density
    // audit behind bot-ring / coordinated-activity detection in data
    // curation, and the density complement to q65's components, q105's
    // centrality and q157's k-core (components say WHO is connected;
    // triangles say how CLIQUISH the neighborhood is). The Spark side
    // enumerates triangles with operators.Triangles — degree-ordered
    // orientation, O(m^1.5) wedge bound — while the oracle's plain
    // 3-way join over the u1<u2 edge list counts each triangle once
    // (tractable at oracle scale; the oriented form is the one that
    // scales). coeff = 2·tri / deg·(deg-1) is one double division of
    // exact integers (the q91-lift convention). Scale: the pair stage is
    // keyed by the (event_type, hour) cell — bounded by per-cell active
    // users, the q91 per-doc self-join shape — and everything after the
    // edge list is the operator's three narrow-column shuffles.
    QuerySpec.sqlBacked("q196_triangle_communities",
      s"""WITH $interactEdgeCtes,
         |tri AS (SELECT e1.u1 AS a, e1.u2 AS b, e2.u2 AS c
         |        FROM pe e1 JOIN pe e2 ON e2.u1 = e1.u2
         |             JOIN pe e3 ON e3.u1 = e1.u1 AND e3.u2 = e2.u2),
         |pnt AS (SELECT n, count(*) AS tri FROM (
         |          SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
         |          UNION ALL SELECT c FROM tri) GROUP BY n),
         |dg AS (SELECT n, count(*) AS deg FROM (
         |         SELECT u1 AS n FROM pe UNION ALL SELECT u2 FROM pe)
         |       GROUP BY n),
         |tot AS (SELECT count(*) AS total_tri FROM tri)
         |SELECT n AS user_id, CAST(deg AS BIGINT) AS deg,
         |  CAST(tri AS BIGINT) AS tri,
         |  CAST(2 * tri AS DOUBLE) / (deg * (deg - 1)) AS coeff,
         |  CAST(total_tri AS BIGINT) AS total_tri
         |FROM pnt JOIN dg USING (n), tot
         |ORDER BY tri DESC, user_id LIMIT 20""".stripMargin) { (s, dir) =>
      // no scratch checkpoints: every repeated subframe (pe feeds the
      // operator AND dg; pnt feeds the report AND the total) is an
      // IDENTICAL subplan, so Spark's ReusedExchange serves each from
      // one shuffle write — measured faster than materialization
      // barriers here (9.9 s checkpointed -> 5.8 s reused, sf0.1).
      // RE-A/B'd in r15 (the 306-Exchange static plan raised the
      // plan-size suspicion again): withScratch(pe) measured 11-13 s
      // vs 4.5-6 s for reuse at sf0.1 — the cache barrier serializes
      // what AQE stage-reuse overlaps, so reuse stays.
      val pe = interactEdges(s, dir)
      val pnt = graft.operators.Triangles.run(pe)
        .select(explode(array(col("a"), col("b"), col("c"))).as("n"))
        .groupBy(col("n")).agg(count(lit(1)).as("tri"))
      val dg = pe
        .select(explode(array(col("u1"), col("u2"))).as("n"))
        .groupBy(col("n")).agg(count(lit(1)).as("deg"))
      // each triangle lands in pnt at all 3 corners — the global
      // total is sum div 3, no second pass over the triangle frame
      val tot = pnt.agg(expr("sum(tri) div 3").as("total_tri"))
      pnt.join(dg, "n")
        .crossJoin(broadcast(tot))
        .select(col("n").as("user_id"), col("deg"), col("tri"),
          ((col("tri") * 2).cast("double") /
            (col("deg") * (col("deg") - 1))).as("coeff"),
          col("total_tri"))
        .orderBy(col("tri").desc, col("user_id")).limit(20)
    },

    // ------------------------------------------------------------------
    // q206: edge triangle support — the k-truss building block on the
    // q196 graph: each edge's support is the number of triangles it
    // closes (an edge in no triangle is a bridge/noise tie; a high-
    // support edge sits inside a clique — the edge-level density
    // signal beside q196's node-level coefficients and q157's k-core).
    // The support frame is ONE aggregate over the triangle list (each
    // triangle lands at its 3 edges); top-20 by (support, u, v) is the
    // bounded report. Scale: everything after operators.Triangles'
    // O(m^1.5) enumeration is a narrow-column groupBy keyed by the
    // edge, and nothing reaches the driver beyond 20 rows.
    QuerySpec.sqlBacked("q206_edge_support",
      s"""WITH $interactEdgeCtes,
         |tri AS (SELECT e1.u1 AS a, e1.u2 AS b, e2.u2 AS c
         |        FROM pe e1 JOIN pe e2 ON e2.u1 = e1.u2
         |             JOIN pe e3 ON e3.u1 = e1.u1 AND e3.u2 = e2.u2),
         |es AS (SELECT a AS u, b AS v FROM tri
         |       UNION ALL SELECT a, c FROM tri
         |       UNION ALL SELECT b, c FROM tri)
         |SELECT u, v, CAST(count(*) AS BIGINT) AS support
         |FROM es GROUP BY u, v
         |ORDER BY support DESC, u, v LIMIT 20""".stripMargin) { (s, dir) =>
      // exchange-reuse, not scratch persists, serves the operator's
      // repeated pe references (the q196 A/B, re-confirmed r15:
      // persisting pe measured 4.6-15 s vs 3.9-4.2 s for reuse)
      graft.operators.Triangles.edgeSupport(interactEdges(s, dir))
        .orderBy(col("support").desc, col("u"), col("v")).limit(20)
    },

    // ------------------------------------------------------------------
    // q207: degree assortativity — Pearson correlation of endpoint
    // degrees over the symmetrized q196 edge list (Newman '02): the
    // one-number mixing diagnostic (hub-to-hub wiring → positive;
    // hub-to-leaf → negative) read before trusting community structure
    // — coordinated rings wire assortatively, organic activity doesn't.
    // The q88 exact-moment convention: n, Σx, Σy, Σxy, Σx², Σy² are
    // exact BIGINTs (degrees ≤ |V|, headroom checked), r is one double
    // expression over them. Scale: a degree aggregate, one stamp join
    // back to edges, and a 6-long mergeable moment row — map-side
    // partials end to end.
    QuerySpec.sqlBacked("q207_assortativity",
      s"""WITH $interactEdgeCtes,
         |dg AS (SELECT n, CAST(count(*) AS BIGINT) AS deg FROM (
         |         SELECT u1 AS n FROM pe UNION ALL SELECT u2 FROM pe)
         |       GROUP BY n),
         |e2 AS (SELECT u1 AS s, u2 AS t FROM pe
         |       UNION ALL SELECT u2, u1 FROM pe),
         |ep AS (SELECT a.deg AS x, b.deg AS y
         |       FROM e2 JOIN dg a ON a.n = e2.s JOIN dg b ON b.n = e2.t),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x*y) AS BIGINT) AS sxy,
         |    CAST(sum(x*x) AS BIGINT) AS sxx,
         |    CAST(sum(y*y) AS BIGINT) AS syy FROM ep)
         |SELECT n, sx, sxy, sxx,
         |  CAST(n*sxy - sx*sy AS DOUBLE)
         |    / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
         |     * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS assortativity
         |FROM m""".stripMargin) { (s, dir) =>
      val pe = interactEdges(s, dir)
      Dedup.withScratch(pe) {
        graft.operators.GraphStats.assortativity(pe)
      }
    },

    // ------------------------------------------------------------------
    // q208: k-truss peel (k=3, two bounded rounds) on the STRONG-tie
    // graph (>= 5 shared cells): iteratively drop every edge whose
    // triangle support falls below k-2 — the edge-pruning dual of
    // q157's node-peeling k-core, and the graph family's first
    // ITERATIVE edge-centric op. Bounded rounds are the house
    // recurrence contract (q105's 3 damped iterations, q134's radius
    // budget): each round re-enumerates triangles on the surviving
    // edges via operators.Triangles and reports (edges_in,
    // n_triangles, edges_kept) — the convergence trace IS the output,
    // so the gate stays meaningful even where the truss empties. The
    // oracle unrolls the same two rounds as chained CTEs over the
    // shared strong-tie edge template. Scale: per round, one O(m^1.5)
    // enumeration over a shrinking edge set plus an edge-keyed
    // support aggregate.
    QuerySpec.sqlBacked("q208_ktruss", {
      // AS MATERIALIZED on the peel chain: t_r reads e_r three times and
      // s_r reads t_r three times, so DuckDB's default CTE inlining
      // re-expands the whole prefix ~9^r times (e2 inlines the pair
      // template ~81x — measured 4 GB at sf0.01 where each materialized
      // frame is a few thousand rows). The q186 lesson, same fix.
      def roundCtes(r: Int): String =
        s"""t$r AS MATERIALIZED (SELECT e1.u1 AS a, e1.u2 AS b, e2.u2 AS c
           |  FROM e$r e1 JOIN e$r e2 ON e2.u1 = e1.u2
           |       JOIN e$r e3 ON e3.u1 = e1.u1 AND e3.u2 = e2.u2),
           |s$r AS MATERIALIZED (SELECT u, v, count(*) AS sup FROM (
           |    SELECT a AS u, b AS v FROM t$r
           |    UNION ALL SELECT a, c FROM t$r
           |    UNION ALL SELECT b, c FROM t$r) GROUP BY u, v),
           |e${r + 1} AS MATERIALIZED (SELECT u AS u1, v AS u2 FROM s$r
           |  WHERE sup >= 1)""".stripMargin
      s"""WITH ${interactCtes(5)},
         |e0 AS MATERIALIZED (SELECT u1, u2 FROM pe),
         |${roundCtes(0)},
         |${roundCtes(1)}
         |SELECT * FROM (
         |  SELECT 1 AS round,
         |    (SELECT CAST(count(*) AS BIGINT) FROM e0) AS edges_in,
         |    (SELECT CAST(count(*) AS BIGINT) FROM t0) AS n_triangles,
         |    (SELECT CAST(count(*) AS BIGINT) FROM e1) AS edges_kept
         |  UNION ALL
         |  SELECT 2,
         |    (SELECT CAST(count(*) AS BIGINT) FROM e1),
         |    (SELECT CAST(count(*) AS BIGINT) FROM t1),
         |    (SELECT CAST(count(*) AS BIGINT) FROM e2))
         |ORDER BY round""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      // driver-coordinated peel loop (operators.Triangles.trussPeel —
      // the ConnectedComponents/KMeans shape): per-round state on the
      // driver is THREE longs; the edge set itself stays a
      // checkpointed distributed frame inside the operator
      graft.operators.Triangles
        .trussPeel(interactEdges(s, dir, minW = 5), k = 3, rounds = 2)
        .toDF("round", "edges_in", "n_triangles", "edges_kept")
        .orderBy(col("round"))
    },

    // ------------------------------------------------------------------
    // q199: interval coalescing (gaps-and-islands) — merge each
    // supplier's overlapping/touching transit intervals into maximal
    // covered spans: the double-coverage-free utilization primitive
    // q160 (pair counts) and q161 (peak concurrency) both sidestep, and
    // the classic warehouse formulation — an island opens exactly where
    // a start strictly clears the running max of every earlier end.
    // Both the running max and the island index are per-key window
    // scans; all arithmetic is epoch-µs integers, so islands and spans
    // are engine-exact. Scale: ONE hash exchange keyed by supplier and
    // two ordered window passes over it — no join, no explode; the
    // output is one row per island, bounded by the interval count and
    // in practice by temporal clustering.
    QuerySpec.sqlBacked("q199_interval_coalesce",
      """WITH i AS (SELECT l_suppkey AS k,
        |    l_orderkey * 10 + l_linenumber AS id,
        |    epoch_us(CAST(l_shipdate AS TIMESTAMP)) AS s0,
        |    epoch_us(CAST(l_shipdate AS TIMESTAMP))
        |      + CAST(floor(l_quantity) AS BIGINT) * 86400000000 AS e0
        |  FROM lineitem),
        |w AS (SELECT k, id, s0, e0,
        |    max(e0) OVER (PARTITION BY k ORDER BY s0, id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM i),
        |isl AS (SELECT k, s0, e0,
        |    CAST(sum(CASE WHEN pm IS NULL OR s0 > pm THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY k ORDER BY s0, id
        |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
        |  FROM w)
        |SELECT k AS suppkey, island,
        |  CAST(min(s0) AS BIGINT) AS span_s0,
        |  CAST(max(e0) AS BIGINT) AS span_e0,
        |  CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(max(e0) - min(s0) AS BIGINT) AS covered_us
        |FROM isl GROUP BY k, island
        |ORDER BY suppkey, island""".stripMargin) { (s, dir) =>
      // the recurrence lives in IncrementalCoalesce.batchTruth — ONE
      // definition shared with the streaming twin, so the live islands
      // can never drift from this gate (the q138 observations rule)
      graft.streaming.IncrementalCoalesce
        .batchTruth(transitIntervals(s, dir))
        .select(col("k").as("suppkey"), col("island"), col("span_s0"),
          col("span_e0"), col("n_intervals"), col("covered_us"))
        .orderBy(col("suppkey"), col("island"))
    },

    // ------------------------------------------------------------------
    // q200: position-based (U-shaped) multi-touch attribution — the
    // whole-journey complement to q138's last-touch: every touch in the
    // purchase's 7-day lookback earns credit, 40% to the first, 40% to
    // the last, 20% split across the middles. Credit is EXACT integer
    // basis points (first/last 4000, middles 2000 div (n-2) with the
    // remainder assigned to the first touch; n=1 -> 10000, n=2 ->
    // 5000/5000), so every purchase's credits sum to exactly 10000 and
    // channel totals are engine-exact integers. Same strictly-earlier
    // (ts, event_id) rule as q138/q145. Scale: the purchase x touch
    // join is keyed by user_id with per-user pairs bounded by activity
    // x window (the q138 shape); positions are one window over the
    // per-purchase groups; the report is a |channels|-row aggregate.
    QuerySpec.sqlBacked("q200_position_attribution",
      """WITH e AS (SELECT event_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
        |  FROM events
        |  WHERE event_type IN ('click', 'view', 'purchase')),
        |p AS (SELECT event_id AS pid, user_id, us AS pus FROM e
        |      WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_id AS tid, us AS tus,
        |        event_type AS channel FROM e
        |      WHERE event_type <> 'purchase'),
        |j AS (SELECT pid, channel, tus, tid
        |      FROM p JOIN t USING (user_id)
        |      WHERE (tus < pus OR (tus = pus AND tid < pid))
        |        AND tus >= pus - 604800000000),
        |r AS (SELECT pid, channel,
        |    row_number() OVER (PARTITION BY pid ORDER BY tus, tid) AS rn,
        |    count(*) OVER (PARTITION BY pid) AS n FROM j),
        |c AS (SELECT pid, channel, CASE
        |    WHEN n = 1 THEN 10000
        |    WHEN n = 2 THEN 5000
        |    WHEN rn = 1 THEN 4000 + (2000 - (n - 2) * (2000 // (n - 2)))
        |    WHEN rn = n THEN 4000
        |    ELSE 2000 // (n - 2) END AS bp FROM r)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(count(DISTINCT pid) AS BIGINT) AS n_purchases,
        |  CAST(sum(bp) AS BIGINT) AS total_bp
        |FROM c GROUP BY channel ORDER BY channel""".stripMargin) {
      (s, dir) =>
      val ev = Tables(s, dir, "events")
        .filter(col("event_type").isin("click", "view", "purchase"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"),
          col("us").as("pus"))
      val t = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_id").as("tid"),
          col("us").as("tus"), col("event_type").as("channel"))
      val perP = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pid"))
      val r = p.join(t, Seq("user_id"))
        .filter((col("tus") < col("pus") ||
          (col("tus") === col("pus") && col("tid") < col("pid"))) &&
          col("tus") >= col("pus") - 604800000000L)
        .withColumn("rn", row_number().over(
          perP.orderBy(col("tus"), col("tid"))))
        .withColumn("n", count(lit(1)).over(perP))
      r.withColumn("bp", expr("CASE WHEN n = 1 THEN 10000L " +
          "WHEN n = 2 THEN 5000L " +
          "WHEN rn = 1 THEN 4000L + (2000L - (n - 2) * " +
            "(2000L div (n - 2))) " +
          "WHEN rn = n THEN 4000L " +
          "ELSE 2000L div (n - 2) END"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_touches"),
          countDistinct(col("pid")).as("n_purchases"),
          sum(col("bp")).as("total_bp"))
        .orderBy(col("channel"))
    }
  )

  /** q196's per-cell active-user cap: cells busier than this carry no
    * coordination signal (half the user base passing through one hour
    * cell says nothing about any PAIR in it) and cost quadratically —
    * the q97 posting-list df-cap doctrine applied to co-occurrence
    * cells. Measured: uncapped, the 10x corpus's cells densify ~10x and
    * the pair stage materializes 136M rows (vs sf0.1's 1.4M — exact
    * quadratic growth); capped, pair cost is <= cells * cap². sf0.1's
    * densest cell holds 51 actives, so the cap is invisible at the
    * gated SFs. */
  // `final` matters: specs (declared above) forces interactEdgeCtes
  // during object init, BEFORE a plain val here would be assigned —
  // final + literal is compile-time constant-folded, immune to order
  private final val InteractCellCap = 64

  /** q196/q206/q207/q208's edge frame as DuckDB CTE text: `ev` =
    * distinct (user, event_type, hour) interaction cells, `cc` = cells
    * under the [[InteractCellCap]], `pe` = undirected u1 < u2 edges
    * between users sharing >= `minW` capped cells. One template so
    * every graph gate provably builds the same graph (the flagCumQty/
    * attributionCtes anti-drift rule). */
  private def interactCtes(minW: Int): String =
    s"""ev AS (SELECT DISTINCT user_id AS u, event_type AS et,
      |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hb FROM events),
      |cc AS (SELECT et, hb FROM ev GROUP BY et, hb
      |       HAVING count(*) <= $InteractCellCap),
      |evc AS (SELECT ev.u, ev.et, ev.hb FROM ev JOIN cc USING (et, hb)),
      |pe AS (SELECT a.u AS u1, b.u AS u2 FROM evc a
      |       JOIN evc b ON a.et = b.et AND a.hb = b.hb AND a.u < b.u
      |       GROUP BY a.u, b.u HAVING count(*) >= $minW)""".stripMargin

  private lazy val interactEdgeCtes = interactCtes(3)

  /** Spark twin of [[interactCtes]]: the (u1, u2) co-interaction edge
    * list, u1 < u2, weight threshold `minW` over cap-filtered cells.
    * The cap is a count window over (et, hb) — not a join back to an
    * aggregate — so the capped frame comes out hash-partitioned on
    * exactly the pair self-join's key and the join reuses the exchange. */
  private def interactEdges(s: org.apache.spark.sql.SparkSession,
      dir: String, minW: Int = 3): DataFrame = {
    val cell = org.apache.spark.sql.expressions.Window
      .partitionBy(col("et"), col("hb"))
    val evc = Tables(s, dir, "events")
      .select(col("user_id").as("u"), col("event_type").as("et"),
        date_trunc("hour", col("ts")).as("hb"))
      .distinct()
      .withColumn("na", count(lit(1)).over(cell))
      .filter(col("na") <= InteractCellCap)
      .drop("na")
    evc.select(col("u").as("u1"), col("et"), col("hb"))
      .join(evc.select(col("u").as("u2"), col("et"), col("hb")),
        Seq("et", "hb"))
      .filter(col("u1") < col("u2"))
      .groupBy(col("u1"), col("u2"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minW)
      .select(col("u1"), col("u2"))
  }

  /** q165/q174's shared oracle — the OBVIOUS lateral nearest-1 probe;
    * the tier-(a) union+window form and the tier-(c) native exec in
    * direction='nearest' both hash against this text, so the driver
    * gate is the answer-identity of the three formulations. */
  private def nearestOracleSql =
    """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
      |    event_type FROM events),
      |p AS (SELECT event_id, user_id, ts FROM e
      |      WHERE event_type = 'purchase'),
      |t AS (SELECT user_id, ts, event_type AS channel FROM (
      |    SELECT user_id, ts, event_type, row_number() OVER (
      |      PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |    FROM e WHERE event_type IN ('click', 'view')) WHERE rn = 1)
      |SELECT p.event_id, coalesce(l.channel, 'none') AS channel,
      |       l.gap_us
      |FROM p LEFT JOIN LATERAL (
      |  SELECT t.channel,
      |    abs(epoch_us(t.ts) - epoch_us(p.ts)) AS gap_us
      |  FROM t WHERE t.user_id = p.user_id
      |    AND abs(epoch_us(t.ts) - epoch_us(p.ts)) <= 3600000000
      |  ORDER BY gap_us,
      |    CASE WHEN epoch_us(t.ts) <= epoch_us(p.ts) THEN 0 ELSE 1 END
      |  LIMIT 1) l ON true
      |ORDER BY p.event_id""".stripMargin

  /** q57/q169's shared oracle — DuckDB's NATIVE ASOF JOIN; both the
    * tier-(a) composition and the tier-(c) physical operator hash
    * against the same text, so the two Spark plans are provably
    * answer-identical. */
  private def asofOracleSql =
    """SELECT a.event_id, a.user_id, a.ts, b.event_id AS view_id,
      |  b.value AS view_value
      |FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events
      |      WHERE event_type = 'click') a
      |ASOF LEFT JOIN
      |     (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events
      |      WHERE event_type = 'view') b
      |  ON a.user_id = b.user_id AND b.ts <= a.ts
      |ORDER BY a.event_id""".stripMargin

  /** q165's touch frame: non-purchase events deduped to one row per
    * (user, ts) — [[TemporalJoins.nearest]]'s right-uniqueness
    * precondition — keeping the max-event_id row (struct max, event_id
    * leading; the same rule the oracle's row_number DESC applies). */
  private def dedupedTouches(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    Tables(s, dir, "events")
      .filter(col("event_type").isin("click", "view"))
      .groupBy(col("user_id"), col("ts"))
      .agg(max(struct(col("event_id"), col("event_type"))).as("m"))
      .select(col("user_id"), col("ts"), col("m.event_type").as("channel"))

  /** q160/q161's shared projection: each lineitem's in-transit interval
    * [shipdate, shipdate + floor(quantity) days] as epoch-µs longs, with
    * `id = orderkey·10 + linenumber` (linenumber ≤ 7 — unique, and an
    * integer total order both engines share). ONE definition so the two
    * gates provably sweep the same intervals. */
  private def transitIntervals(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    Tables(s, dir, "lineitem").select(
      col("l_suppkey").as("k"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
      // l_shipdate lands as TIMESTAMP_NTZ; session TZ is pinned UTC in
      // every entrypoint, so this cast is the identity the oracle's
      // CAST(... AS TIMESTAMP) also applies
      unix_micros(col("l_shipdate").cast("timestamp")).as("s0"),
      (unix_micros(col("l_shipdate").cast("timestamp")) +
        floor(col("l_quantity")).cast("long") * 86400000000L).as("e0"))
}
