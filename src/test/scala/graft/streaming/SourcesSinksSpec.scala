package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{ForeachWriter, Row, SaveMode}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Production source/sink paths (SURVEY §2.1/§2.5): a file-stream source
  * discovering files incrementally (the DataSource-v2 shape behind
  * `addSource` in production), and the ForeachWriter per-element sink
  * (`SinkFunction.invoke` analogue, open/process/close lifecycle). */
class SourcesSinksSpec extends SparkSpec {
  import spark.implicits._

  test("file-stream source: incrementally discovered parquet feeds a running agg") {
    val dir = Files.createTempDirectory("graft_filestream").toString
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("v", IntegerType)))
    // seed file must exist before the stream starts resolving
    Seq(("a", 1), ("b", 2)).toDF("k", "v")
      .write.mode(SaveMode.Append).parquet(dir)
    val counts = StreamEnv(spark)
      .fromDataset(spark.readStream.schema(schema).parquet(dir).as[(String, Int)])
      .keyBy(_._1)
      .reduce((x, y) => (x._1, x._2 + y._2))
      .toDataset
    val q = counts.writeStream.format("memory").queryName("fs_out")
      .outputMode(OutputMode.Update).start()
    try {
      q.processAllAvailable()
      // a second file arrives later; the source must pick it up
      Seq(("a", 10)).toDF("k", "v").write.mode(SaveMode.Append).parquet(dir)
      q.processAllAvailable()
      val latest = spark.table("fs_out").as[(String, Int)].collect()
        .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).max) }
      assert(latest == Map("a" -> 11, "b" -> 2))
    } finally q.stop()
  }

  test("orc round-trip and hive-partitioned write with partition pruning") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 30.0))
      .toDF("k", "id", "v")
    val orcDir = Files.createTempDirectory("graft_orc").toString + "/t"
    graft.sources.IO.writeOrc(df, orcDir)
    assert(graft.sources.IO.readOrc(spark, orcDir).collect().length == 3)

    // xml (native in Spark 4): values survive the round-trip
    val xmlDir = Files.createTempDirectory("graft_xml").toString + "/t"
    graft.sources.IO.writeXml(df, xmlDir)
    val xb = graft.sources.IO.readXml(spark, xmlDir)
      .select(col("k"), col("id"), col("v"))
      .as[(String, Long, Double)].collect().toSet
    assert(xb == Set(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 3L, 30.0)))

    val partDir = Files.createTempDirectory("graft_part").toString + "/t"
    graft.sources.IO.writePartitioned(df, partDir, "k")
    val back = graft.sources.IO.readParquet(spark, partDir)
    assert(back.collect().length == 3)
    // filter on the partition column must prune at the scan, not post-read:
    // the parquet scan's PartitionFilters must carry the k predicate
    val pruned = back.filter(col("k") === "a")
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("(k")), s"no partition filter on k in:\n$plan")
    assert(pruned.count() == 2)
  }

  test("stream-static enrichment join: every record picks up its dim row") {
    import org.apache.spark.sql.functions.broadcast
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((0, "bronze"), (1, "silver")).toDF("uid", "tier")
    val in = MemoryStream[(Int, Double)]
    val q = in.toDS().toDF("uid", "v")
      .join(broadcast(dim), "uid") // static side broadcast per micro-batch
      .writeStream.format("memory").queryName("enrich")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((0, 1.5), (1, 2.5), (0, 3.5), (7, 9.9)) // 7 has no dim row
      q.processAllAvailable()
      val rows = spark.table("enrich").collect()
        .map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).toSet
      assert(rows == Set((0, 1.5, "bronze"), (0, 3.5, "bronze"),
        (1, 2.5, "silver")))
    } finally q.stop()
  }

  test("ForeachWriter sink: per-element invoke with open/close lifecycle") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Int]
    val q = in.toDS().toDF("v").writeStream
      .foreach(new ForeachWriter[Row] {
        def open(partitionId: Long, epochId: Long): Boolean = true
        def process(r: Row): Unit = SourcesSinksSpec.sink.add(r.getInt(0))
        def close(errorOrNull: Throwable): Unit = ()
      })
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(1, 2, 3)
      q.processAllAvailable()
      assert(SourcesSinksSpec.sink.value.size() == 3)
    } finally q.stop()
  }
}

object SourcesSinksSpec {
  // accumulator-backed sink: ForeachWriter runs on executors, so a plain
  // driver-side collection would stay empty on a real cluster
  lazy val sink = SparkSpec.session.sparkContext
    .collectionAccumulator[Int]("foreach_sink")
}
