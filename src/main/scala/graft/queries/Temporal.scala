package graft.queries

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

  val specs: Seq[QuerySpec] = Seq(

    // ------------------------------------------------------------------
    // As-of join: each click gets the user's most recent view at or
    // before the click (sessionization's "attribute action to last
    // impression" primitive). (user_id, ts) is unique in the corpus, so
    // the as-of tiebreak is deterministic.
    QuerySpec.sqlBacked("q57_asof_join",
      """SELECT a.event_id, a.user_id, a.ts, b.event_id AS view_id,
        |  b.value AS view_value
        |FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events
        |      WHERE event_type = 'click') a
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
    }
  )
}
