package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SkewJoin.salted: row-for-row equality with the plain join (salting
  * must be invisible in the result) and the structural guarantee that
  * the shuffle actually spreads the key — the exchange partitions on
  * (key, salt), not key alone. */
class SkewJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def sides() = {
    val docs = graft.sources.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val dim = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("src_docs"), sum(col("n_chars")).as("src_chars"))
    (docs, dim)
  }

  test("salted join returns exactly the plain join's rows") {
    val (docs, dim) = sides()
    val salted = SkewJoin.salted(docs, dim, "source", 16, col("doc_id"))
      .select("doc_id", "source", "src_docs", "src_chars")
    val plain = docs.join(dim, "source")
      .select("doc_id", "source", "src_docs", "src_chars")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salted join diverged from the plain join")
    assert(salted.count() === docs.count(), "inner join must keep every fact")
  }

  test("saltsFor sizes the fan-out from the hot share") {
    // below the reducer-domination threshold: no salting
    assert(SkewJoin.saltsFor(0.01, 32) == 1)
    // hot key holding 25% of rows on 32 reducers needs 8 cells
    assert(SkewJoin.saltsFor(0.25, 32) == 8)
    // a fully degenerate key caps at the partition count
    assert(SkewJoin.saltsFor(1.0, 32) == 32)
  }

  test("audit-driven salting equals the plain join row-for-row") {
    import spark.implicits._
    // genuinely skewed facts: key 0 holds half the rows — exactly the
    // single-hot-key shape the audit exists to catch
    val facts = (1 to 4000).map { i =>
      (i.toLong, if (i % 2 == 0) 0L else (i % 97).toLong + 1L)
    }.toDF("row_id", "k")
    val dim = facts.groupBy(col("k")).agg(count(lit(1)).as("k_rows"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val audited = SkewJoin.audited(facts, dim, "k", col("row_id"))
      val plain = facts.join(dim, "k").select("row_id", "k", "k_rows")
      val a = audited.select("row_id", "k", "k_rows")
      assert(a.exceptAll(plain).isEmpty && plain.exceptAll(a).isEmpty,
        "audited salted join diverged from the plain join")
      val (nRows, hotN) = SkewJoin.audit(facts, "k")
      assert(hotN == 2000 && nRows == 4000)
      val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val expected = SkewJoin.saltsFor(hotN.toDouble / nRows, p)
      assert(expected > 1, s"test premise: expected a salted plan, got $expected")
      assert(SkewJoin.auditedSaltCount(facts, "k") == expected)
      val plan = audited.queryExecution.executedPlan.toString
      assert("hashpartitioning\\([^)]*graft_salt".r.findFirstIn(plan).isDefined,
        s"expected hashpartitioning on (key, salt):\n$plan")
      // the derived cell count is visible in the dim-side fan-out: the
      // constant-folded 0..salts-1 salt array the dim explodes against
      val saltCells = audited.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
          g.generator.children.collectFirst {
            case org.apache.spark.sql.catalyst.expressions.Literal(
                arr: org.apache.spark.sql.catalyst.util.ArrayData, _) =>
              arr.numElements()
          }
      }.flatten
      assert(saltCells == Seq(expected),
        s"expected one dim fan-out of $expected salt cells, got $saltCells")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("audit skips salting for a key that dominates no reducer") {
    val (docs, _) = sides()
    // doc_id is unique: hot_share ~ 1/n, far below 1/partitions
    val dimById = docs.select(col("doc_id"), col("n_chars").as("dim_chars"))
    val joined = SkewJoin.audited(docs, dimById, "doc_id", col("doc_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("graft_salt"),
      s"uniform key must take the unsalted path:\n$plan")
    assert(joined.count() == docs.count())
  }

  test("the exchange partitions on (key, salt), spreading hot keys") {
    val (docs, dim) = sides()
    // disable auto-broadcast so the plan shows the real shuffle shape the
    // operator exists for (a broadcast dim needs no salting at all)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = SkewJoin.salted(docs, dim, "source", 16, col("doc_id"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("graft_salt"),
        s"expected the salt in the join/exchange keys:\n$plan")
      assert("hashpartitioning\\([^)]*graft_salt".r.findFirstIn(plan).isDefined,
        s"expected hashpartitioning on (key, salt):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
