package graft.queries

import graft.SparkSpec

/** q191/q192 against independent in-memory references on the sf0.001
  * corpus: the epoch arithmetic replayed as a sequential fold over the
  * score-ordered docs, and the materialized sequences rebuilt from the
  * SequencePackSpec-verified greedy plus plain string concatenation.
  * Pins what the oracle hash alone cannot localize: which stage drifts
  * if a refactor breaks the PrefixSum order, the epoch division, or the
  * in-bin sort. */
class CurriculumSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    Profiling.specs.find(_.name == name).get.run(spark, dir)

  /** (doc_id, source, words) straight from the corpus. */
  private def corpus(): Seq[(Long, String, Array[String])] =
    graft.sources.Tables(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ")))
      .toSeq

  test("q191 epochs equal the sequential fold over the curriculum order") {
    val docs = corpus().map { case (id, _, ws) =>
      (id, ws.length.toLong, 100L * ws.distinct.length / ws.length)
    }
    val total = docs.map(_._2).sum
    val budget = 1L + total / 4L
    var cum = 0L
    val want = docs.sortBy { case (id, _, score) => (-score, id) }
      .map { case (id, t, score) =>
        cum += t
        id -> ((score, t, (cum - t) / budget + 1L))
      }.toMap
    val got = run("q191_curriculum_epochs").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == want)
    // epochs are contiguous from 1 (no budget bucket skipped)
    val epochs = got.values.map(_._3).toSet
    assert(epochs == (1L to epochs.max).toSet)
  }

  test("q192 sequences equal the greedy's bins concatenated in doc order") {
    val cap = 256L
    val want = corpus()
      .groupBy { case (id, src, _) => (src, id / 64L) }
      .toSeq
      .flatMap { case ((src, chunk), g) =>
        var fill = 0L
        var bin = 0L
        g.sortBy(_._1).map { case (id, _, ws) =>
          val t = math.min(ws.length.toLong, cap)
          if (bin == 0L || fill + t > cap) { bin += 1L; fill = t }
          else fill += t
          ((src, chunk, bin), (id, ws.take(t.toInt).mkString(" "), t))
        }
      }
      .groupBy(_._1)
      .map { case (k, g) =>
        val inOrder = g.map(_._2).sortBy(_._1)
        k -> ((inOrder.size.toLong, inOrder.map(_._3).sum,
          inOrder.map(_._2).mkString(" ")))
      }
    val got = run("q192_sequence_materialize").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getString(5))))
      .toMap
    assert(got == want)
    // every bin respects the capacity
    assert(got.values.forall(_._2 <= cap))
  }
}
