package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Plan-shape pins for headline scale claims (the q132-barrier
  * doctrine: a Spark upgrade that silently changes the plan must fail
  * CI, not just drift the PLANS.md audit). Shapes are asserted on the
  * final executed plan at sf0.001. */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // materialize so AQE finalizes the physical plan
    df.queryExecution.executedPlan.toString
  }

  test("q150 repetition profile is a zero-explode projection") {
    val plan = executedPlan("q150_doc_repetition")
    // the native expression's whole point: no Generate (explode) and no
    // (doc, gram) aggregate exchange — only Tables.spread's test-corpus
    // repartition and the output sort may shuffle
    assert(!plan.contains("Generate"), s"explode crept back in:\n$plan")
    val exchanges = "Exchange".r.findAllIn(
      plan.split("== Initial Plan ==")(0)).size
    assert(exchanges <= 2, s"unexpected exchanges:\n$plan")
    assert(plan.contains("graft_repstats"), s"native node missing:\n$plan")
  }

  test("q154 Gram is one aggregate exchange of fixed-size partials") {
    val plan = executedPlan("q154_gram_matrix")
    val finalSection = plan.split("== Initial Plan ==")(0)
    val exchanges = "Exchange".r.findAllIn(finalSection).size
    assert(exchanges == 1, s"expected exactly the partial-merge " +
      s"exchange:\n$plan")
    assert(finalSection.contains("ObjectHashAggregate"),
      s"aggregate missing:\n$plan")
    // the explode happens AFTER the aggregate (4096 rows), never before
    val aggIdx = finalSection.indexOf("ObjectHashAggregate")
    val genIdx = finalSection.indexOf("Generate")
    assert(genIdx >= 0 && genIdx < aggIdx,
      s"Generate must sit above the aggregate in the tree:\n$plan")
  }
}
