package graft.streaming

import scala.collection.mutable

import graft.SparkSpec
import graft.sources.ParallelSourceFunction

/** The executor-parallel custom source (DataSource-v2 MicroBatchStream,
  * SURVEY §2.1's production mapping for addSource): N partitions read in
  * parallel tasks, offset ranges advance incrementally (no re-reads), and
  * each partition's records arrive in generation order. */
class ParallelSourceSpec extends SparkSpec {

  test("4-partition source: parallel reads, incremental offsets, per-partition order") {
    import spark.implicits._
    val limit = new java.util.concurrent.atomic.AtomicLong(5L)
    val src = new ParallelSourceFunction[(Int, Long)] {
      def numPartitions: Int = 4
      def latestOffset(): Long = limit.get()
      def read(partition: Int, from: Long, until: Long): Iterator[(Int, Long)] =
        (from until until).iterator.map(i => (partition, i))
    }
    // arrival log per source partition, appended in batch order; within a
    // batch, collect() returns partitions in order, each in reader order
    val arrived = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]
    val q = StreamEnv(spark).addParallelSource(src).toDataset
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[(Int, Long)], _: Long) =>
        ParallelSourceSpec.synchronized {
          df.collect().foreach { case (p, i) =>
            arrived.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += i
          }
        }
      }
      .start()
    try {
      q.processAllAvailable()
      ParallelSourceSpec.synchronized {
        assert(arrived.keySet == Set(0, 1, 2, 3))
        assert(arrived.values.forall(_.sorted == (0L until 5L).toBuffer))
      }
      limit.set(12L) // next poll reads only [5, 12) — incremental, no re-read
      q.processAllAvailable()
      ParallelSourceSpec.synchronized {
        // exactly-once: every partition saw 0..11 exactly once...
        assert(arrived.values.forall(_.sorted == (0L until 12L).toBuffer))
        // ...and in generation order per partition (the ordering assert)
        assert(arrived.values.forall(b => b == b.sorted),
          s"out-of-order arrival: $arrived")
      }
    } finally q.stop()
    // stop() evicts the registry entry (user closures are not pinned for
    // the session); restarting needs a fresh addParallelSource, and the
    // stale handle fails with a diagnostic, not an NPE
    val e = intercept[Exception] {
      StreamEnv(spark).fromDataset(
        spark.readStream
          .format(classOf[graft.sources.PartitionedSourceProvider].getName)
          .option(graft.sources.PartitionedSource.IdKey, "gone").load()
          .as[(Int, Long)]).toDataset
    }
    assert(e.getMessage.contains("no registered graft source"))
  }
}

object ParallelSourceSpec
