package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/** UDAF surface (SURVEY §2.3): the reference's `AggregateFunction
  * <IN,ACC,OUT>` contract (`api/common/functions/AggregateFunction.java:
  * 129-164` — createAccumulator/add/merge/getResult, dead code there) is
  * method-for-method Spark's `Aggregator[IN,BUF,OUT]`
  * (zero/reduce/merge/finish). This adapter restores the reference-shaped
  * contract and compiles it to a typed Spark aggregation — partial
  * (map-side) aggregation and codegen come from Catalyst.
  */
abstract class GAggregateFunction[IN, ACC, OUT] extends Serializable {
  def createAccumulator(): ACC
  def add(value: IN, acc: ACC): ACC
  def merge(a: ACC, b: ACC): ACC
  def getResult(acc: ACC): OUT
}

object GAggregateFunction {
  /** Compile the reference-shaped contract to a Spark Aggregator. */
  def toAggregator[IN, ACC: Encoder, OUT: Encoder](
      f: GAggregateFunction[IN, ACC, OUT]): Aggregator[IN, ACC, OUT] =
    new Aggregator[IN, ACC, OUT] {
      def zero: ACC = f.createAccumulator()
      def reduce(acc: ACC, v: IN): ACC = f.add(v, acc)
      def merge(a: ACC, b: ACC): ACC = f.merge(a, b)
      def finish(acc: ACC): OUT = f.getResult(acc)
      def bufferEncoder: Encoder[ACC] = implicitly[Encoder[ACC]]
      def outputEncoder: Encoder[OUT] = implicitly[Encoder[OUT]]
    }
}

/** Accumulator surface (SURVEY §2.3): the reference's side-channel job
  * metrics (`api/common/accumulators/`, 9 files, merged driver-side at
  * job end) map onto Spark accumulators; `Dataset.observe` is the idiomatic
  * per-query variant. Thin named constructors so facade users get the
  * reference vocabulary. */
final class GMetrics(ds: Dataset[_]) {
  private val sc = ds.sparkSession.sparkContext
  def longCounter(name: String) = sc.longAccumulator(name)
  def doubleCounter(name: String) = sc.doubleAccumulator(name)
  def listAccumulator[T](name: String) = sc.collectionAccumulator[T](name)
}
