package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph scalar diagnostics over an undirected edge list
  * (u < v, deduplicated — the [[Triangles]] contract). The reference
  * engine has no graph analytics (SURVEY §1.3); this carries the
  * one-number mixing statistics next to the per-node (PageRank, KCore)
  * and per-edge (Triangles.edgeSupport) families. */
object GraphStats {

  /** Degree assortativity (Newman '02): Pearson correlation of endpoint
    * degrees over the SYMMETRIZED edge list. Exact-moment convention
    * (the q88 doctrine): n, Σx, Σy, Σxy, Σx², Σy² are exact BIGINTs
    * and the correlation is ONE double expression over them — so the
    * result is deterministic across partitionings and oracle-able.
    * Returns a single row (n, sx, sxy, sxx, assortativity); like-with-
    * like wiring → positive, hub-to-leaf → negative, a degree-regular
    * graph has zero variance → NULL (DuckDB renders float division by
    * zero as NULL, so the guarded division is what keeps the oracle
    * hash stable on degenerate graphs — ANSI Spark would throw
    * instead). Scale: a degree
    * aggregate, one stamp join back to edges, and a 6-long mergeable
    * moment row — map-side partials end to end. */
  def assortativity(edges: DataFrame): DataFrame = {
    val pe = edges.toDF("u1", "u2")
    val dg = pe.select(explode(array(col("u1"), col("u2"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val e2 = pe.select(col("u1").as("s"), col("u2").as("t"))
      .unionAll(pe.select(col("u2").as("s"), col("u1").as("t")))
    e2.join(dg.select(col("n").as("s"), col("deg").as("x")), "s")
      .join(dg.select(col("n").as("t"), col("deg").as("y")), "t")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n"), col("sx"), col("sxy"), col("sxx"), {
        val num = (col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double")
        val den = sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")) *
          sqrt((col("n") * col("syy") - col("sy") * col("sy"))
            .cast("double"))
        when(den === 0.0, lit(null).cast("double"))
          .otherwise(num / den).as("assortativity")
      })
  }
}
