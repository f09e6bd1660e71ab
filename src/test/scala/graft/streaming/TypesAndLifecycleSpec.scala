package graft.streaming

import graft.SparkSpec

/** Type-system parity (SURVEY §1.3) and rich-function lifecycle / side
  * outputs. The reference's reflective TypeInformation surface maps to
  * implicit Encoders: tuples, case classes (≙ POJOs), Either (≙
  * types/Either.java), primitive arrays. */
class TypesAndLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def env = StreamEnv(spark)

  test("case-class records (POJO analogue) round-trip with typed keyBy") {
    val people = Seq(Person("ada", 36), Person("bob", 41), Person("ada", 1))
    val out = env.fromCollection(people)
      .keyBy(_.name)
      .maxBy(_.age)
      .toDataset.collect().toSet
    assert(out == Set(Person("ada", 36), Person("bob", 41)))
  }

  test("tuple records: positional access like Tuple2.f0/f1") {
    val out = env.fromElements(("a", 1), ("b", 2))
      .map(t => (t._1.toUpperCase, t._2 * 10))
      .toDataset.collect().toSet
    assert(out == Set(("A", 10), ("B", 20)))
  }

  test("Either disjoint union (types/Either.java analogue) via ADT rows") {
    // encode Either as the nullable-pair struct SURVEY §1.3 prescribes
    val mixed: Seq[(Option[Int], Option[String])] =
      Seq((Some(1), None), (None, Some("x")), (Some(2), None))
    val out = env.fromCollection(mixed)
      .map {
        case (Some(i), None) => s"left:$i"
        case (_, Some(s))    => s"right:$s"
        case _               => "invalid"
      }
      .toDataset.collect().toSet
    assert(out == Set("left:1", "left:2", "right:x"))
  }

  test("primitive arrays survive encoding") {
    val out = env.fromElements(Array(1, 2, 3), Array(4))
      .map(_.sum)
      .toDataset.collect().sorted.toSeq
    assert(out == Seq(4, 6))
  }

  test("mapRich: open once per partition, close after last record") {
    val opens = spark.sparkContext.longAccumulator("opens")
    val closes = spark.sparkContext.longAccumulator("closes")
    val out = env.fromCollection((1 to 100).toList).rebalance(4)
      .mapRich { () => opens.add(1); new StringBuilder("ctx") } {
        (ctx, i) => s"${ctx.length}:$i"
      } { _ => closes.add(1) }
      .toDataset.collect()
    assert(out.length == 100 && out.forall(_.startsWith("3:")))
    assert(opens.value == 4 && closes.value == 4)
  }

  test("sideOutput: two-filter fan-out partitions the stream") {
    val (evens, odds) = env.fromCollection((1 to 10).toList)
      .sideOutput(_ % 2 == 0)
    assert(evens.toDataset.collect().toSet == Set(2, 4, 6, 8, 10))
    assert(odds.toDataset.collect().toSet == Set(1, 3, 5, 7, 9))
  }

  test("sideOutputScoped: both branches materialize from ONE upstream pass") {
    import spark.implicits._
    // every upstream row-evaluation bumps the accumulator; with the lazy
    // two-filter split this would read 2000 (each branch recomputes the
    // map), the scoped split must leave it at exactly 1000
    val touches = spark.sparkContext.longAccumulator("touches")
    val src = spark.range(0, 1000).as[Long].map { x => touches.add(1); x }
    val (evenCount, oddCount) = env.fromDataset(src)
      .sideOutputScoped(_ % 2 == 0) { (evens, odds) =>
        (evens.toDataset.count(), odds.toDataset.count())
      }
    assert(evenCount == 500 && oddCount == 500)
    assert(touches.value == 1000,
      s"upstream ran ${touches.value} row-evaluations; one pass = 1000")
    // scoped: no cache residue after use
    assert(org.apache.spark.sql.graft.bridge.cacheIsEmpty(spark))
  }

  test("connectBroadcast: dimension updates are visible at the next batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dim").toString
    Seq((1, "bronze"), (2, "silver")).toDF("k", "tier")
      .coalesce(1).write.mode("overwrite").parquet(dimDir)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    val out = collection.mutable.ArrayBuffer[(Int, String)]()
    val q = env.fromDataset(in.toDS().toDF("k").as[Int])
      .connectBroadcast(s => s.read.parquet(dimDir)) { (batch, dim) =>
        batch.toDF("k").join(dim, "k")
      } { joined =>
        out.synchronized { out ++= joined.as[(Int, String)].collect() }
      }
      .start()
    try {
      in.addData(1, 2); q.processAllAvailable()
      // slowly changing dimension: tier 2 is promoted between batches
      Seq((1, "bronze"), (2, "gold")).toDF("k", "tier")
        .coalesce(1).write.mode("overwrite").parquet(dimDir)
      in.addData(2); q.processAllAvailable()
    } finally q.stop()
    assert(out.sorted.toSeq == Seq((1, "bronze"), (2, "silver"), (2, "gold")).sorted)
  }

  test("sideOutputForeach: streaming micro-batches route to both sinks once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    val evens = collection.mutable.ArrayBuffer[Int]()
    val odds = collection.mutable.ArrayBuffer[Int]()
    val q = env.fromDataset(in.toDS())
      .sideOutputForeach(_ % 2 == 0)(
        b => evens.synchronized { evens ++= b.collect() },
        b => odds.synchronized { odds ++= b.collect() })
      .start()
    try {
      in.addData(1 to 10: _*); q.processAllAvailable()
      in.addData(11 to 14: _*); q.processAllAvailable()
    } finally q.stop()
    assert(evens.sorted.toSeq == (2 to 14 by 2))
    assert(odds.sorted.toSeq == (1 to 13 by 2))
  }
}

case class Person(name: String, age: Int)
