package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType,
  StructField, StructType}

/** Streaming mini-batch k-means — the continuous twin of
  * [[graft.operators.KMeans]] the way [[IncrementalDedup]] is q80's:
  * centroids live as running state between micro-batches and every
  * arriving batch refines them, so corpus organization (topic balance,
  * IVF lists, diversity sampling) tracks an ingest stream instead of
  * requiring a full-corpus re-cluster per refresh. The recurrence is
  * Sculley's mini-batch k-means (WWW 2010) at micro-batch granularity,
  * made engine-deterministic the KMeans way:
  *
  *  - assignment: exact integer squared-L2 argmin under the current
  *    centroids (lowest-cid tiebreak) — [[graft.operators.KMeans
  *    .assignUnder]], a broadcast-1-row projection over the batch;
  *  - per-cluster batch statistics (count + per-dim sums): ONE k-key
  *    aggregate of map-side partials — exact integers, order-free, so
  *    the step is partition-invariant within a batch;
  *  - update: N_j += n_j; cv_j += (s_j - n_j * cv_j) div N_j
  *    elementwise — the running integer mean pulled toward the batch,
  *    deterministic in the batch SEQUENCE (streams are ordered; that
  *    sequence-dependence is the mini-batch contract, not an engine
  *    artifact). A cluster the batch never hits keeps its centroid
  *    (the batch-KMeans carry-forward rule).
  *
  * Scale: the batch scan is the only distributed work per round; the
  * centroid table is k rows held on the driver between batches — the
  * same k-row state the batch operator localCheckpoints per iteration.
  * Run it under `foreachBatch`; recovery = re-seeding from the last
  * emitted centroid snapshot (k rows, trivially persisted by the sink).
  *
  * Init: the k lowest ids of the FIRST batch (the q98 deterministic
  * convention; the first batch must carry at least k vectors).
  */
final class IncrementalKMeans(k: Int, dim: Int) extends Serializable {
  require(k >= 1 && dim >= 1)

  // cid -> (centroid micro-units, points absorbed); cid = 0..k-1
  private var cv: Array[Array[Long]] = _
  private var n: Array[Long] = _

  def isInitialized: Boolean = cv != null

  /** Current centroids as (cid, centroid, points-absorbed). */
  def centroids: Seq[(Int, Seq[Long], Long)] =
    if (cv == null) Seq.empty
    else cv.indices.map(j => (j, cv(j).toSeq, n(j)))

  /** The k-row centroid DataFrame (cid, cv) under the current state. */
  def centroidDF(spark: SparkSession): DataFrame = {
    require(cv != null, "IncrementalKMeans: no batch absorbed yet")
    val rows = cv.indices.map(j => Row(j, cv(j).toSeq))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(StructField("cid", IntegerType, nullable = false),
        StructField("cv", ArrayType(LongType, containsNull = false),
          nullable = false))))
  }

  /** Assign `vecs` (id, qv) under the current centroids. */
  def assign(vecs: DataFrame): DataFrame =
    graft.operators.KMeans.assignUnder(vecs, centroidDF(vecs.sparkSession))
      .select(col("id"), col("cid").as("cluster"), col("dist"))

  /** Absorb one micro-batch of (id, qv) rows. */
  def update(batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    val v = batch.select(col(batch.columns(0)).as("id"),
      col(batch.columns(1)).as("qv"))
    if (cv == null) {
      val seeds = v.orderBy(col("id")).limit(k).select(col("qv")).collect()
      require(seeds.length == k,
        s"IncrementalKMeans init needs >= $k vectors in the first batch, " +
          s"got ${seeds.length}")
      cv = seeds.map(_.getSeq[Long](0).toArray)
      n = Array.fill(k)(0L)
    }
    val sums = (0 until dim).map(i => sum(expr(s"qv[$i]")).as(s"s$i"))
    val stats = graft.operators.KMeans
      .assignUnder(v, centroidDF(spark))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("bn"), sums: _*)
      .collect()
    // batch-granular Sculley update, exact integers; clusters absent
    // from the batch carry forward untouched
    stats.foreach { r =>
      val j = r.getInt(0)
      val bn = r.getLong(1)
      n(j) += bn
      var i = 0
      while (i < dim) {
        val s = r.getLong(2 + i)
        cv(j)(i) += (s - bn * cv(j)(i)) / n(j)
        i += 1
      }
    }
  }
}
