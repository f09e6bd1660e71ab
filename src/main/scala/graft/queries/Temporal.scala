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
      val other = ev.select(col("user_id").as("_ru"), col("ts").as("_rts"),
        col("event_id").as("b_id"))
        .withColumnRenamed("_ru", "user_id").withColumnRenamed("_rts", "ts")
      TemporalJoins.range(ev, other, "user_id", "ts",
          -15L * 60 * 1000000, 15L * 60 * 1000000, Seq("b_id"))
        .filter(col("b_id") =!= col("event_id"))
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_near"))
        .orderBy(col("event_id"))
    }
  )
}
