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
