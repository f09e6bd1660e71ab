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

  /** Per-community quality over an undirected edge list (u < v,
    * deduplicated) and a node labeling (node, community): n_nodes,
    * intra_edges (both endpoints inside), cut_edges (exactly one
    * endpoint inside), vol = 2·intra + cut (the community's degree
    * mass), the modularity contribution Q_c = intra/m − (vol/(2m))²
    * (Newman & Girvan 2004), and conductance φ_c = cut/min(vol, 2m−vol)
    * (Kannan/Vempala/Vetta; NULL when the community owns the whole edge
    * mass — min = 0 makes it undefined, stated not hidden). All counts
    * are exact BIGINTs; the two ratios are single fixed-shape double
    * expressions (only +,*,/ in a pinned order — the q112 doctrine, so
    * a DuckDB oracle hash-matches them). Scale: one edge-label
    * equi-join against the node-sized labeling, two key-bounded grouped
    * counts (map-side partials), a 1-row broadcast total; the report is
    * |communities| rows. Labels must cover every edge endpoint (inner
    * join semantics: an unlabeled endpoint would silently drop its
    * edges — the caller owns that contract). */
  def communityQuality(edges: DataFrame, labels: DataFrame): DataFrame = {
    val ed = edges.toDF("a_id", "b_id")
    val lab = labels.toDF("node", "community")
    val m = ed.agg(count(lit(1)).as("m"))
    val ej = ed
      .join(lab.select(col("node").as("a_id"), col("community").as("ca")),
        "a_id")
      .join(lab.select(col("node").as("b_id"), col("community").as("cb")),
        "b_id")
      .select(col("ca"), col("cb"))
      .localCheckpoint() // two grouped consumers (intra + cut)
    val intra = ej.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community"))
      .agg(count(lit(1)).as("intra"))
    val cut = ej.filter(col("ca") =!= col("cb"))
      .select(explode(array(col("ca"), col("cb"))).as("community"))
      .groupBy(col("community"))
      .agg(count(lit(1)).as("cut"))
    lab.groupBy(col("community")).agg(count(lit(1)).as("n_nodes"))
      .join(intra, Seq("community"), "left")
      .join(cut, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("intra"), lit(0L)).as("intra_edges"),
        coalesce(col("cut"), lit(0L)).as("cut_edges"))
      .crossJoin(broadcast(m))
      // the oracle's formulas verbatim (expr strings): div, then sub,
      // then the squared ratio as an explicit self-product — no pow,
      // no reassociation (the q112 double doctrine)
      .select(col("community"), col("n_nodes"), col("intra_edges"),
        col("cut_edges"),
        expr("2*intra_edges + cut_edges").as("vol"),
        expr("""CAST(intra_edges AS DOUBLE) / CAST(m AS DOUBLE)
          | - (CAST(2*intra_edges + cut_edges AS DOUBLE) / CAST(2*m AS DOUBLE))
          |   * (CAST(2*intra_edges + cut_edges AS DOUBLE) / CAST(2*m AS DOUBLE))"""
          .stripMargin.replace("\n", "")).as("modularity"),
        expr("""CAST(cut_edges AS DOUBLE)
          | / CAST(NULLIF(LEAST(2*intra_edges + cut_edges,
          |     2*m - (2*intra_edges + cut_edges)), 0) AS DOUBLE)"""
          .stripMargin.replace("\n", "")).as("conductance"))
  }
}
