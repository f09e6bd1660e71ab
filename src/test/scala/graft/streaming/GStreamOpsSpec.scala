package graft.streaming

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** Per-operator unit tests for the facade (SURVEY §2.2–2.4) plus the
  * SURVEY §5.2 properties — permutation invariance of keyed reduce for
  * commutative-associative functions, and repartitioning invariance —
  * checked over seeded random samples (the scalatest-scalacheck bridge
  * artifact is not in the offline cache, so no Gen/forAll).
  */
class GStreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def env = StreamEnv(spark)

  test("map: 1-to-1 transform") {
    assert(env.fromElements(1, 2, 3).map(_ * 2).toDataset.collect().sorted
      .sameElements(Array(2, 4, 6)))
  }

  test("flatMap: 1-to-N via iterator") {
    assert(env.fromElements("a b", "c").flatMap(_.split(" "))
      .toDataset.collect().sorted.sameElements(Array("a", "b", "c")))
  }

  test("filter: predicate keep") {
    assert(env.fromElements(1, 2, 3, 4).filter(_ % 2 == 0)
      .toDataset.collect().sorted.sameElements(Array(2, 4)))
  }

  test("union: same-type merge keeps duplicates") {
    val a = env.fromElements(1, 2)
    val b = env.fromElements(2, 3)
    assert(a.union(b).toDataset.collect().sorted.sameElements(Array(1, 2, 2, 3)))
  }

  test("rebalance: repartition preserves data") {
    val s = env.fromCollection((1 to 100).toList)
    val r = s.rebalance(7)
    assert(r.toDataset.rdd.getNumPartitions == 7)
    assert(r.toDataset.collect().sorted.toSeq == (1 to 100).toSeq)
  }

  test("transform escape hatch: per-partition logic") {
    val out = env.fromCollection((1 to 10).toList).rebalance(2)
      .transform(it => Iterator.single(it.sum))
      .toDataset.collect()
    assert(out.sum == 55)
  }

  test("keyBy + minBy/maxBy keep the full record like the reference") {
    val data = Seq(("a", 3, "x"), ("a", 1, "y"), ("b", 2, "z"))
    val mins = env.fromCollection(data).keyBy(_._1)
      .minBy(_._2).toDataset.collect().toSet
    assert(mins == Set(("a", 1, "y"), ("b", 2, "z")))
    val maxs = env.fromCollection(data).keyBy(_._1)
      .maxBy(_._2).toDataset.collect().toSet
    assert(maxs == Set(("a", 3, "x"), ("b", 2, "z")))
  }

  test("property: keyed reduce is permutation-invariant for comm-assoc fns") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val data0 = List.fill(40)(
        (s"k${rnd.nextInt(3)}", rnd.nextInt(201) - 100))
      val expected = data0.groupBy(_._1).map { case (k, vs) =>
        (k, vs.map(_._2).sum)
      }.toSet
      val got = env.fromCollection(data0).keyBy(_._1)
        .reduce((a, b) => (a._1, a._2 + b._2)).toDataset.collect().toSet
      assert(got == expected)
      val shuffled = rnd.shuffle(data0)
      val got2 = env.fromCollection(shuffled).keyBy(_._1)
        .reduce((a, b) => (a._1, a._2 + b._2)).toDataset.collect().toSet
      assert(got2 == expected)
    }
  }

  test("property: results independent of partition count") {
    val data = (1 to 200).map(i => (s"k${i % 7}", i))
    val expected = data.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    for (n <- Seq(1, 3, 16)) {
      val got = env.fromCollection(data).rebalance(n).keyBy(_._1)
        .maxBy(_._2).toDataset.collect().map(t => t._1 -> t._2).toMap
      assert(got == expected)
    }
  }

  test("name() tags the plan and is a no-op for results") {
    val named = env.fromElements(1, 2, 3).name("my_source")
    assert(named.toDataset.queryExecution.analyzed.toString
      .contains("my_source"))
    assert(named.map(_ * 2).toDataset.collect().sorted.toSeq == Seq(2, 4, 6))
  }

  test("explicit-Encoder map/flatMap overloads (TypeInformation path)") {
    import org.apache.spark.sql.Encoders
    val out = env.fromElements("a", "bb")
      .mapTyped((s: String) => s.length, Encoders.scalaInt)
      .toDataset.collect().sorted.toSeq
    assert(out == Seq(1, 2))
    val out2 = env.fromElements("x y", "z")
      .flatMapTyped((s: String) => s.split(" ").toSeq, Encoders.STRING)
      .toDataset.collect().sorted.toSeq
    assert(out2 == Seq("x", "y", "z"))
  }

  test("partitionCustom places each record in the chosen partition") {
    val data = (1 to 40).toList
    val gs = env.fromCollection(data).partitionCustom((t, n) => t % n, 4)
    val byPartition = gs.toDataset.rdd
      .mapPartitionsWithIndex((i, it) => it.map(v => (i, v)))
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byPartition.keySet == Set(0, 1, 2, 3))
    for ((pid, vs) <- byPartition) assert(vs.forall(_ % 4 == pid))
    assert(byPartition.values.map(_.size).sum == 40)
  }

  test("cogroup combines both full groups per key") {
    val orders = env.fromCollection(Seq((1, "o1"), (1, "o2"), (2, "o3")))
      .keyBy(_._1)
    val pays = env.fromCollection(Seq((1, 10.0), (2, 20.0), (2, 5.0), (3, 1.0)))
      .keyBy(_._1)
    val out = orders.cogroup(pays) { (k, os, ps) =>
      Seq((k, os.size, ps.map(_._2).sum))
    }.toDataset.collect().toSet
    assert(out == Set((1, 2, 10.0), (2, 1, 25.0), (3, 0, 1.0)))
  }

  test("iterate: fixed-point loop converges and bounds rounds") {
    // collatz-flavored: halve evens, fix odds at 1 via min — converges to
    // all-ones; the convergence probe compares round sums
    val out = env.fromCollection(Seq(8, 5, 12, 1))
      .map(n => if (n % 2 == 0) n else 1)
      .iterate(maxIter = 10) { s =>
        s.map(n => if (n % 2 == 0) n / 2 else 1)
      } { (prev, next) =>
        prev.toDataset.collect().sum == next.toDataset.collect().sum
      }
      .toDataset.collect().toSeq
    assert(out == Seq(1, 1, 1, 1))
    // non-convergence is loud, not silent
    val e = intercept[IllegalStateException] {
      env.fromCollection(Seq(1)).iterate(3)(s => s.map(_ + 1))((_, _) => false)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("print(sinkIdentifier) prefixes every record") {
    val buf = new java.io.ByteArrayOutputStream()
    val orig = System.out
    System.setOut(new java.io.PrintStream(buf, true))
    try env.fromElements(1, 2, 3).print("tag")
    finally System.setOut(orig)
    val lines = buf.toString.linesIterator.filter(_.startsWith("tag> ")).toSeq
    assert(lines.sorted == Seq("tag> 1", "tag> 2", "tag> 3"))
  }

  test("addSink(ForeachWriter): open/process/close lifecycle on batch") {
    GStreamOpsSpec.sunk.clear()
    GStreamOpsSpec.opened.set(0)
    GStreamOpsSpec.closed.set(0)
    val out = env.fromCollection((1 to 10).toList).rebalance(2)
      .addSink(new org.apache.spark.sql.ForeachWriter[Int] {
        def open(partitionId: Long, epochId: Long): Boolean =
          { GStreamOpsSpec.opened.incrementAndGet(); true }
        def process(v: Int): Unit = GStreamOpsSpec.sunk.add(v)
        def close(e: Throwable): Unit = GStreamOpsSpec.closed.incrementAndGet()
      })
    assert(out.isEmpty) // batch: no streaming query handle
    assert(GStreamOpsSpec.sunk.size == 10)
    assert(GStreamOpsSpec.opened.get == 2 && GStreamOpsSpec.closed.get == 2)
  }

  test("addSink(ForeachWriter) + setBufferTimeout on a streaming source") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    GStreamOpsSpec.sunk.clear()
    val gs = new GStream(mem.toDS()).setBufferTimeout(10)
      .map(_ + 0).filter(_ => true) // the knob must survive chaining
    assert(gs.bufferTimeoutMs == 10)
    assert(env.fromElements(1).setBufferTimeout(7)
      .keyBy(identity).maxBy(identity).bufferTimeoutMs == 7) // and keyBy
    val q = gs.addSink(new org.apache.spark.sql.ForeachWriter[Int] {
        def open(partitionId: Long, epochId: Long): Boolean = true
        def process(v: Int): Unit = GStreamOpsSpec.sunk.add(v)
        def close(e: Throwable): Unit = ()
      }).get
    try {
      mem.addData(7, 8)
      val deadline = System.currentTimeMillis() + 30000
      while (GStreamOpsSpec.sunk.size < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(GStreamOpsSpec.sunk.asScala.toSet == Set(7, 8))
    } finally q.stop()
  }

  test("Either-typed stream via the sealed-ADT encoder") {
    import StreamEnv.eitherEncoder
    val xs: Seq[Either[String, Int]] = Seq(Left("a"), Right(1), Right(2))
    val out = env.fromCollection(xs)
      .filter(_.isRight)
      .mapTyped((e: Either[String, Int]) => e.toOption.get, org.apache.spark.sql.Encoders.scalaInt)
      .toDataset.collect().sorted.toSeq
    assert(out == Seq(1, 2))
  }
}

/** Static sink state for ForeachWriter tests — writers serialize into
  * tasks, so mutation must go through a JVM-global (local-mode tests
  * share the JVM). */
object GStreamOpsSpec {
  val sunk = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  val opened = new java.util.concurrent.atomic.AtomicInteger(0)
  val closed = new java.util.concurrent.atomic.AtomicInteger(0)
}
