package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-6 ninth wave: BPE merge training (q130),
  * exact-integer outlier detection (q131), index-accelerated phrase
  * search (q132), and SCD2 history construction (q133). The DuckDB
  * differential gate proves end-to-end equality; these specs pin the
  * properties the gate cannot see — fold semantics on adversarial
  * symbol sequences, guard behavior, losslessness of the index path,
  * and the interval algebra of the history table.
  */
class WarehouseOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Reference BPE merge: greedy leftmost-non-overlapping merge of one
    * pair within a symbol list — the semantics both engines' fold must
    * reproduce. */
  private def refMerge(syms: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  test("q130 fold-merge matches reference greedy semantics on adversarial symbols") {
    // overlap run ("a a a"), merged-symbol boundary ("ab c" vs pair
    // (b, c) — substring match across a symbol boundary must NOT fire),
    // single-symbol words, and a multi-char lhs suffix trap ("x ab" vs
    // pair (b, …)).
    val cases = Seq(
      (List("a", "a", "a"), "a", "a"),
      (List("a", "a", "a", "a"), "a", "a"),
      (List("ab", "c"), "b", "c"),
      (List("x", "ab", "b"), "ab", "b"),
      (List("ab"), "a", "b"),
      (List("a", "b", "b"), "a", "b"),
      (List("zab", "ab", "b"), "ab", "b"))
    val df = cases.toDF("syms", "lhs", "rhs")
      .withColumn("ss", col("syms"))
      // the PRODUCTION fold string — not a copy (TextOps.bpeFoldCase)
      .withColumn("merged", expr(TextOps.bpeFoldCase))
    val got = df.select(col("merged")).as[String].collect().toSeq
    val want = cases.map { case (syms, l, r) => refMerge(syms, l, r).mkString(" ") }
    assert(got == want, s"fold diverged:\n got=$got\nwant=$want")
  }

  test("q130 fold-merge property: random symbol lists and pairs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sym = Gen.oneOf("a", "b", "ab", "ba", "c", "abc")
    val prop = Prop.forAll(
      Gen.listOfN(24, Gen.nonEmptyListOf(sym).map(_.take(8))),
      sym, sym) { (wordsRaw, l, r) =>
      val words = wordsRaw.filter(_.nonEmpty)
      val got = words.map(w => (w, l, r)).toDF("ss", "lhs", "rhs")
        .withColumn("m", expr(TextOps.bpeFoldCase))
        .select(col("m")).as[String].collect().toSeq
      val want = words.map(w => refMerge(w, l, r).mkString(" "))
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, s"fold property: ${res.status}")
  }

  test("q130 emits 4 rounds with positive counts and growing symbols") {
    val rows = graft.SparkEntry.queries("q130_bpe_merges")(spark, dir)
      .collect()
    assert(rows.length == 4)
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.forall(_.getLong(3) > 0))
    // each merged symbol is the concatenation of its parts and every
    // later round's pair may reference earlier merges only
    val merged = rows.map(r => r.getString(1) + r.getString(2))
    assert(merged.distinct.length == 4, "the same pair merged twice")
  }

  test("q131 flags exactly the per-user 2-sigma tail and the guard fires") {
    val out = graft.SparkEntry.queries("q131_outlier_events")(spark, dir)
      .select(col("event_id")).as[Long].collect().toSet
    // reference: same integer arithmetic in Scala
    val ev = graft.sources.Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        floor(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long)].collect().toSeq
    val byUser = ev.groupBy(_._2).filter(_._2.size >= 12)
    val want = byUser.flatMap { case (_, rows) =>
      val n = rows.size.toLong
      val s = rows.map(_._3).sum
      val q = rows.map(x => x._3 * x._3).sum
      rows.filter { case (_, _, x) =>
        val d = n * x - s
        d * d > 4 * (n * q - s * s)
      }.map(_._1)
    }.toSet
    assert(out == want, s"outlier sets differ: extra=${out -- want} missing=${want -- out}")

    // guard: a 15001-event user must fail loudly, not wrap
    val big = (1L to 15001L).map(i => (i, 1L, 100.0)).toDF("event_id", "user_id", "value")
    val x = big.select(col("event_id"), col("user_id"),
      floor(col("value") * 100).cast("long").as("cents"))
    val g = x.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n", when(col("n") > 15000,
        expr("raise_error('guard')").cast("long")).otherwise(col("n")))
    val e = intercept[Exception] { g.collect() }
    assert(e.getMessage.contains("guard"))
  }

  test("q132 bigram candidate set is a lossless superset of true phrase matches") {
    val phrase = "table window table"
    val docs = graft.sources.Tables(spark, dir, "documents")
    val truth = docs
      .filter(concat(lit(" "), col("text"), lit(" ")).contains(s" $phrase "))
      .select(col("doc_id")).as[Long].collect().toSet
    val grams = phrase.split(" ").toSeq.sliding(2).map(_.mkString(" ")).toSeq
    val candidates = docs
      .select(col("doc_id"),
        explode(graft.plans.WordShingles(col("text"), 2, distinct = true)).as("g"))
      .filter(col("g").isin(grams: _*))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("ng"))
      .filter(col("ng") === grams.size)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(truth.subsetOf(candidates),
      s"index lost true matches: ${truth -- candidates}")
    val result = graft.SparkEntry.queries("q132_phrase_search")(spark, dir)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(result == truth)
  }

  test("q135 trailing frame equals a reference fold and gaps count") {
    val rows = graft.SparkEntry.queries("q135_rolling_features")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, rs) =>
      val days = rs.sortBy(_._2)
      days.foreach { case (_, day, _, t7c, t7d) =>
        val in = days.filter(r => r._2 >= day - 6 && r._2 <= day)
        assert(t7c == in.map(_._3).sum, s"user $u day $day t7_cents")
        assert(t7d == in.size.toLong, s"user $u day $day t7_days")
      }
    }
    // the RANGE frame must skip inactive days, and the corpus must
    // actually EXERCISE that: some row far enough from its user's first
    // active day to have a full 7-day window still reports fewer than 7
    // active days — a ROWS frame (or gap-free data) cannot produce this,
    // so a wrong frame OR a corpus that stopped testing the distinction
    // fails here (the first cut of this assertion was a tautology:
    // early rows always have t7_days < 7).
    assert(byUser.values.exists { rs =>
      val first = rs.map(_._2).min
      rs.exists(r => r._2 - first >= 6 && r._5 < 7L)
    }, "no sparse trailing frame found - RANGE vs ROWS is not exercised")
  }

  test("q136 hot keys match a direct computation") {
    val rows = graft.SparkEntry.queries("q136_skew_audit")(spark, dir)
      .collect()
    assert(rows.length == 5)
    val li = graft.sources.Tables(spark, dir, "lineitem")
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toSeq
    val hotN = li.map(_._2).max
    val hotKey = li.filter(_._2 == hotN).map(_._1).min
    val r = rows.find(_.getString(0) == "lineitem.l_partkey").get
    assert(r.getLong(1) == li.map(_._2).sum)
    assert(r.getLong(2) == li.size.toLong)
    assert(r.getLong(3) == hotKey && r.getLong(4) == hotN)
  }

  test("q137 worst dimension matches brute force and the guard fires") {
    val emb = graft.sources.Tables(spark, dir, "embeddings")
      .select(col("label"), col("vec_id"), col("embedding"))
      .as[(Int, Long, Seq[Float])].collect().toSeq
    val want = emb.groupBy(_._1).map { case (lbl, vs) =>
      val h0 = vs.filter(_._2 % 2 == 0).map(_._3)
      val h1 = vs.filter(_._2 % 2 == 1).map(_._3)
      def micro(x: Float): Long = math.floor(x.toDouble * 1000000 + 0.5).toLong
      val dims = vs.head._3.length
      val disps = (0 until dims).map { d =>
        val s0 = h0.map(v => micro(v(d))).sum
        val s1 = h1.map(v => micro(v(d))).sum
        math.abs(s0 * h1.size - s1 * h0.size)
      }
      val best = disps.zipWithIndex.maxBy { case (v, i) => (v, -i) }
      lbl.toLong -> ((best._2 + 1).toLong, best._1)
    }
    val got = graft.SparkEntry.queries("q137_embedding_drift")(spark, dir)
      .select(col("label"), col("dim"), col("shift_num"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == want)

    // guard: >1e6 vectors per half must fail loudly (exercised on the
    // aggregate shape, not 1e6 rows: the when() raises on the count)
    val g = Seq((0, 0L), (0, 1L)).toDF("label", "half")
      .groupBy(col("label"))
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n0"))
      .withColumn("n0", when(col("n0") > 0L,
        expr("raise_error('guard')").cast("long")).otherwise(col("n0")))
    val e = intercept[Exception] { g.collect() }
    assert(e.getMessage.contains("guard"))
  }

  test("q138 attribution partitions every purchase across known channels") {
    val rows = graft.SparkEntry.queries("q138_attribution")(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.map(_._1).toSet.subsetOf(Set("click", "view", "direct")))
    val ev = graft.sources.Tables(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
    assert(rows.map(_._2).sum == purchases.count())
    assert(rows.map(_._3).sum ==
      purchases.select(sum(floor(col("value") * 100).cast("long")))
        .as[Long].head())
  }

  test("q132 materialized-index deployment: search without re-shingling") {
    // the 100 TB shape the q132 scaladoc promises: the posting table is
    // built ONCE (here: a temp parquet; in production bucketed by gram),
    // and a phrase query then runs against the INDEX — no shingling, no
    // corpus scan on the candidate side — yet returns exactly q132's
    // answer. The plan assertion pins scan-freedom: no Generate
    // (explode) node anywhere in the search query.
    val phrase = "table window table"
    val grams = phrase.split(" ").toSeq.sliding(2).map(_.mkString(" ")).toSeq
    val docs = graft.sources.Tables(spark, dir, "documents")
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_postings").toString
    docs.select(col("doc_id"),
        explode(graft.plans.WordShingles(col("text"), 2, distinct = true))
          .as("gram"))
      .write.mode("overwrite").parquet(idxPath)

    val candidates = spark.read.parquet(idxPath)
      .filter(col("gram").isin(grams: _*))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("ng"))
      .filter(col("ng") === grams.size)
    val search = docs.join(broadcast(candidates), "doc_id")
      .filter(concat(
        when(col("ng") === grams.size, lit(" ")).otherwise(lit("-")),
        col("text"), lit(" ")).contains(s" $phrase "))
      .select(col("doc_id"), col("source"), col("n_chars"))
    assert(!search.queryExecution.executedPlan.toString.contains("Generate"),
      "index search must not re-shingle anything")
    val got = search.as[(Long, String, Long)].collect().toSet
    val want = graft.SparkEntry.queries("q132_phrase_search")(spark, dir)
      .as[(Long, String, Long)].collect().toSet
    assert(got == want)
  }

  test("q132 anti-pushdown barrier: verify filter stays above the join") {
    // the barrier (pad char derived from the candidate side) only works
    // while Catalyst does NOT constant-fold the when() via constraint
    // propagation from the ng == #grams candidate filter; an optimizer
    // upgrade that defeats it would silently push contains() below the
    // join and restore the full-corpus verify scan with every
    // functional test still green. Pin the plan shape: the contains
    // Filter sits ABOVE the join, never under it.
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter,
      Join => LJoin}
    val lp = graft.SparkEntry.queries("q132_phrase_search")(spark, dir)
      .queryExecution.optimizedPlan
    val joins = lp.collect { case j: LJoin => j }
    assert(joins.nonEmpty, s"expected a join in q132's plan:\n$lp")
    def hasContains(f: LFilter): Boolean =
      f.condition.toString.toLowerCase.contains("contains")
    val pushedBelow = joins.exists(_.children.exists(_.collect {
      case f: LFilter if hasContains(f) => f
    }.nonEmpty))
    assert(!pushedBelow,
      s"contains() was pushed below the join — barrier defeated:\n$lp")
    // the surviving forms: a Filter node above the join, or the
    // predicate folded into the join condition itself (evaluated on
    // matched pairs — candidates only, the same barrier guarantee)
    val aboveJoin = lp.collect {
      case f: LFilter if hasContains(f) &&
        f.find { case _: LJoin => true; case _ => false }.isDefined => f
    }
    val inJoinCond = joins.exists(
      _.condition.exists(_.toString.toLowerCase.contains("contains")))
    assert(aboveJoin.nonEmpty || inJoinCond,
      s"expected contains() above the join or in its condition:\n$lp")
  }

  test("q133 history is a valid interval partition per user") {
    val h = graft.SparkEntry.queries("q133_scd2_history")(spark, dir)
      .select(col("user_id"), col("status"), col("valid_from"),
        col("valid_to"), col("is_current"), col("version"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4), r.getLong(5)))
      .toSeq
    val users = h.groupBy(_._1)
    users.foreach { case (u, rows) =>
      val sorted = rows.sortBy(_._6)
      // versions are 1..k consecutive
      assert(sorted.map(_._6) == (1L to sorted.length.toLong))
      // exactly one current row, and it is the last version
      assert(sorted.count(_._5) == 1 && sorted.last._5, s"user $u current row")
      // intervals chain: valid_to == next valid_from; only last is open
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._4.contains(b._3), s"user $u gap between versions")
          assert(a._2 != b._2, s"user $u consecutive equal status not collapsed")
        case _ =>
      }
      assert(sorted.last._4.isEmpty)
    }
    // every user with >= 1 event appears
    val nUsers = graft.sources.Tables(spark, dir, "events")
      .select(countDistinct(col("user_id"))).as[Long].head()
    assert(users.size.toLong == nUsers)
  }
}
