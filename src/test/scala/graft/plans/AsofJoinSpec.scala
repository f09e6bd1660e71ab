package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TemporalJoins

/** The native ASOF operator against the tier-(a) union+window form:
  * identical answers on colliding synthetic data (Long and String
  * keys, no-match nulls, any partitioning), and the strategy must
  * actually plan the custom exec node. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private val leftRows = List.tabulate(150)(i =>
    (i % 6, (rnd.nextInt(3000) * 2 + 1).toLong, 1000 + i)).distinct
  private val rightRows = List.tabulate(180)(i =>
    (i % 6, (rnd.nextInt(3000) * 2).toLong, 2000 + i))
    .groupBy(t => (t._1, t._2)).map(_._2.head).toList // unique (key, ts)

  private def leftDf = leftRows.toDF("k", "us", "lid")
    .select(col("k"), timestamp_micros(col("us")).as("t"), col("lid"))
  private def rightDf = rightRows.toDF("k", "us", "rid")
    .select(col("k"), timestamp_micros(col("us")).as("t"), col("rid"))

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.select(col("lid"), col("rid")).collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap

  test("native exec equals the union+window form, and is actually planned") {
    val native = AsofJoin.join(leftDf, rightDf, "k", "t", Seq("rid"))
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoinExec") || plan.contains("AsofJoin"),
      s"strategy did not plan the native node:\n$plan")
    val composed = TemporalJoins.asof(leftDf, rightDf, "k", "t", Seq("rid"))
    assert(collectPairs(native) == collectPairs(composed))
  }

  test("partition-count invariant (co-partitioned merge)") {
    val base = collectPairs(
      AsofJoin.join(leftDf, rightDf, "k", "t", Seq("rid")))
    for ((lp, rp) <- Seq((1, 7), (13, 3), (32, 32))) {
      val got = collectPairs(AsofJoin.join(
        leftDf.repartition(lp), rightDf.repartition(rp), "k", "t",
        Seq("rid")))
      assert(got == base, s"diverged at partitions ($lp, $rp)")
    }
  }

  test("string keys survive the reused-cursor-row copy") {
    val l = leftRows.map { case (k, us, lid) => (s"key$k", us, lid) }
      .toDF("k", "us", "lid")
      .select(col("k"), timestamp_micros(col("us")).as("t"), col("lid"))
    val r = rightRows.map { case (k, us, rid) => (s"key$k", us, rid) }
      .toDF("k", "us", "rid")
      .select(col("k"), timestamp_micros(col("us")).as("t"), col("rid"))
    val got = collectPairs(AsofJoin.join(l, r, "k", "t", Seq("rid")))
    val expect = leftRows.map { case (k, us, lid) =>
      val cands = rightRows.filter(x => x._1 == k && x._2 <= us)
      lid -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
    }.toMap
    assert(got == expect)
  }

  test("null keys and timestamps are unmatchable, not co-grouped") {
    val l = Seq((Some(1), Some(100L), 1), (None, Some(100L), 2),
        (Some(1), None, 3))
      .toDF("k", "us", "lid")
      .select(col("k"), timestamp_micros(col("us")).as("t"), col("lid"))
    val r = Seq((Some(1), Some(50L), 10), (None, Some(40L), 11),
        (Some(1), None, 12))
      .toDF("k", "us", "rid")
      .select(col("k"), timestamp_micros(col("us")).as("t"), col("rid"))
    val got = collectPairs(AsofJoin.join(l, r, "k", "t", Seq("rid")))
    // real pair matches; null-key left gets nothing (NOT the null-key
    // right); null-ts left gets nothing; null-ts right never matches
    assert(got == Map(1 -> Some(10), 2 -> None, 3 -> None))
  }

  test("left keys absent from the right yield null payload") {
    val r = rightDf.filter(col("k") =!= 3)
    val got = collectPairs(AsofJoin.join(leftDf, r, "k", "t", Seq("rid")))
    assert(leftRows.filter(_._1 == 3)
      .forall(t => got(t._3).isEmpty), "missing key did not null out")
  }

  // reference model for the direction/tolerance surface: brute-force
  // over the raw tuples, the TemporalJoins.nearest rules (strictly-after
  // forward, inclusive tolerance, backward wins distance ties)
  private def model(direction: String, tol: Long) =
    leftRows.map { case (k, us, lid) =>
      val b = rightRows.filter(x => x._1 == k && x._2 <= us && us - x._2 <= tol)
        .sortBy(_._2).lastOption
      val f = rightRows.filter(x => x._1 == k && x._2 > us && x._2 - us <= tol)
        .sortBy(_._2).headOption
      val pick = direction match {
        case "backward" => b
        case "forward" => f
        case "nearest" => (b, f) match {
          case (Some(bb), Some(ff)) =>
            if (us - bb._2 <= ff._2 - us) Some(bb) else Some(ff)
          case (x, y) => x.orElse(y)
        }
      }
      lid -> pick.map(_._3)
    }.toMap

  test("direction/tolerance surface matches the brute-force model") {
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(50L, 700L, Long.MaxValue)) {
      val got = collectPairs(AsofJoin.join(leftDf, rightDf, "k", "t",
        Seq("rid"), direction = dir,
        toleranceUs = if (tol == Long.MaxValue) None else Some(tol)))
      assert(got == model(dir, tol), s"diverged at ($dir, tol=$tol)")
    }
  }

  test("nearest equals the tier-(a) union+window form") {
    val tol = 900L
    val native = collectPairs(AsofJoin.join(leftDf, rightDf, "k", "t",
      Seq("rid"), direction = "nearest", toleranceUs = Some(tol)))
    val composed = TemporalJoins
      .nearest(leftDf, rightDf, "k", "t", Seq("rid"), tol)
      .select(col("lid"), col("rid")).collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(native == composed)
  }

  test("nearest is partition-invariant (the peeked forward candidate)") {
    val base = model("nearest", 700L)
    for ((lp, rp) <- Seq((1, 5), (17, 2), (32, 32))) {
      val got = collectPairs(AsofJoin.join(
        leftDf.repartition(lp), rightDf.repartition(rp), "k", "t",
        Seq("rid"), direction = "nearest", toleranceUs = Some(700L)))
      assert(got == base, s"diverged at partitions ($lp, $rp)")
    }
  }

  test("a right at exactly the left's ts is backward, never forward") {
    val l = Seq((1, 100L, 1)).toDF("k", "us", "lid")
      .select(col("k"), timestamp_micros(col("us")).as("t"), col("lid"))
    val r = Seq((1, 100L, 10), (1, 101L, 11)).toDF("k", "us", "rid")
      .select(col("k"), timestamp_micros(col("us")).as("t"), col("rid"))
    val fwd = collectPairs(AsofJoin.join(l, r, "k", "t", Seq("rid"),
      direction = "forward"))
    assert(fwd == Map(1 -> Some(11)), "forward must be strictly after")
    val near = collectPairs(AsofJoin.join(l, r, "k", "t", Seq("rid"),
      direction = "nearest"))
    assert(near == Map(1 -> Some(10)), "distance-0 backward must win")
  }
}
