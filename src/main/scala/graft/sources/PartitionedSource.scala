package graft.sources

import java.util

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Executor-parallel custom source contract ≙ the reference's
  * ParallelSourceFunction (`source/SourceFunction.java` subtypes; each of
  * N subtasks runs the same loop with its own subtask index —
  * `StreamExecutionEnvironment.java:189-199`). The Spark-native execution
  * model additionally demands deterministic REPLAY: a micro-batch that
  * fails is re-read over the same offset range, so instead of a one-shot
  * `run(ctx)` push loop the contract is a pull over `[from, until)` —
  * which is exactly what makes the source exactly-once for free.
  *
  * `latestOffset` is polled on the driver once per micro-batch;
  * `read(partition, from, until)` runs on executors, one task per
  * partition, so throughput scales out with `numPartitions` (the
  * single-driver-thread `StreamEnv.addSource` adapter is the faithful
  * small-scale sibling; this is the production path SURVEY §2.1 names).
  */
trait ParallelSourceFunction[T] extends Serializable {
  /** Source parallelism ≙ setParallelism on the reference's source. */
  def numPartitions: Int
  /** High-watermark offset (per partition, monotonic). The engine reads
    * each partition's `[committed, latestOffset)` range next batch. */
  def latestOffset(): Long
  /** Deterministic record range for one partition — must return the same
    * records for the same (partition, from, until) on replay. */
  def read(partition: Int, from: Long, until: Long): Iterator[T]
}

/** Driver-side registry wiring user source functions (closures — not
  * representable as DataSource option strings) to the provider the
  * `readStream.format(...)` lookup instantiates reflectively. An entry
  * lives from `addParallelSource` until the consuming query stops
  * (`MicroBatchStream.stop` evicts it), so user closures are not pinned
  * for the session's lifetime. */
object PartitionedSource {
  val IdKey = "graft.source.id"
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, (ParallelSourceFunction[_], ExpressionEncoder[_])]()

  def register[T](fn: ParallelSourceFunction[T], enc: Encoder[T]): String = {
    val id = java.util.UUID.randomUUID().toString
    // session-provided encoders are AgnosticEncoders in Spark 4; an
    // already-resolved ExpressionEncoder passes through unchanged
    val eenc = enc match {
      case e: ExpressionEncoder[T] => e
      case a: org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[T] =>
        ExpressionEncoder(a)
      case other => throw new IllegalArgumentException(
        s"unsupported Encoder implementation: ${other.getClass}")
    }
    registry.put(id, (fn, eenc))
    id
  }

  private[sources] def lookup(options: CaseInsensitiveStringMap)
      : (String, ParallelSourceFunction[_], ExpressionEncoder[_]) = {
    val id = options.get(IdKey) // null when the option is absent
    require(id != null,
      s"missing required option $IdKey — use StreamEnv.addParallelSource")
    val e = registry.get(id)
    require(e != null, s"no registered graft source for $IdKey=$id " +
      "(sources register per session via StreamEnv.addParallelSource; " +
      "a stopped query's entry is evicted — re-add the source to restart)")
    (id, e._1, e._2)
  }

  private[sources] def deregister(id: String): Unit = registry.remove(id)
}

/** DataSource-v2 provider: `spark.readStream.format(<this class>)`. */
final class PartitionedSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PartitionedSource.lookup(options)._3.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PartitionedSourceTable(schema,
      new CaseInsensitiveStringMap(properties))
}

private final class PartitionedSourceTable(
    tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft-parallel-source"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
          val (id, fn, enc) = PartitionedSource.lookup(options)
          new PartitionedMicroBatchStream(id, fn, enc)
        }
      }
    }
}

/** Single-long offset (the per-partition high-watermark — all partitions
  * advance together, like Spark's own rate source). */
private final case class TickOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

private final class PartitionedMicroBatchStream(
    id: String, fn: ParallelSourceFunction[_], enc: ExpressionEncoder[_])
    extends MicroBatchStream {
  override def initialOffset(): Offset = TickOffset(0L)
  override def latestOffset(): Offset = TickOffset(fn.latestOffset())
  override def deserializeOffset(json: String): Offset = TickOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  // a stopped source is done (Flink semantics): evict the registry entry
  // so the user function/encoder aren't pinned for the session's
  // lifetime; restarting requires a fresh addParallelSource
  override def stop(): Unit = PartitionedSource.deregister(id)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TickOffset].v
    val e = end.asInstanceOf[TickOffset].v
    (0 until fn.numPartitions)
      .map(p => SourceRange(p, s, e, fn, enc): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val r = partition.asInstanceOf[SourceRange]
        val ser = r.enc.asInstanceOf[ExpressionEncoder[Any]].createSerializer()
        val it = r.fn.asInstanceOf[ParallelSourceFunction[Any]]
          .read(r.pid, r.from, r.until)
        new PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean =
            if (it.hasNext) { cur = ser(it.next()).copy(); true } else false
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
}

/** One executor task's work: partition `pid`, offsets `[from, until)`.
  * Ships the (serializable) user function + encoder to the executor. */
private final case class SourceRange(pid: Int, from: Long, until: Long,
    fn: ParallelSourceFunction[_], enc: ExpressionEncoder[_])
    extends InputPartition
