package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized differential tests for the native expressions against
  * independent in-test models: random corpora (including unicode and
  * degenerate lengths), random partitionings (exercising SimHashAgg's
  * serialize/merge paths), seeds fixed for reproducibility. */
class NativePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)

  // -- models -------------------------------------------------------------

  private def modelRoll(text: String): (Long, Option[(Long, Long, Long)]) = {
    val codes = text.codePoints().toArray.map(_.toLong)
    def fold(cs: Array[Long]): Long =
      cs.reduceLeft((a, c) => (a * 31 + c) % 1000000007L)
    val h = fold(codes)
    if (codes.length < 8) (h, None)
    else {
      val gs = codes.sliding(8).map(w => fold(w.toArray)).toVector
      (h, Some((gs.min, gs.max, gs.distinct.size.toLong)))
    }
  }

  private def modelSimhash(toks: Seq[String]): String = {
    val votes = new Array[Int](64)
    val md = MessageDigest.getInstance("MD5")
    for (t <- toks) {
      val d = md.digest(t.getBytes("UTF-8"))
      for (k <- 0 until 64) {
        val p = k >> 2
        val b = d(p >> 1)
        val nib = if ((p & 1) == 0) (b >> 4) & 0xf else b & 0xf
        votes(k) += 2 * ((nib >> (k & 3)) & 1) - 1
      }
    }
    votes.map(v => if (v > 0) '1' else '0').mkString
  }

  // -- generators ---------------------------------------------------------

  private def randString(maxLen: Int): String = {
    val n = rnd.nextInt(maxLen + 1)
    val sb = new StringBuilder
    while (sb.length < n) {
      rnd.nextInt(4) match {
        case 0 => sb.append((' ' + rnd.nextInt(95)).toChar) // printable ascii
        case 1 => sb.append(('a' + rnd.nextInt(26)).toChar)
        case 2 => sb.append("é中Ж".charAt(rnd.nextInt(3))) // multibyte
        case 3 => sb.append(' ')
      }
    }
    sb.toString
  }

  test("RollingHash matches the model on random strings incl. unicode") {
    val docs = (1 to 200).map(i => (i.toLong, randString(40)))
      .filter(_._2.nonEmpty)
    val got = docs.toDF("id", "text")
      .select(col("id"), RollingHash(col("text")).as("r"))
      .select(col("id"), col("r.h"), col("r.g_min"), col("r.g_max"),
        col("r.n_distinct"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None
        else Some((r.getLong(2), r.getLong(3), r.getLong(4))))).toMap
    for ((id, text) <- docs) {
      assert(got(id) == modelRoll(text), s"doc $id: '$text'")
    }
  }

  test("SimHashAgg matches the model under random grouping and partitioning") {
    for (round <- 1 to 3) {
      val rows = (1 to 500).map { _ =>
        (rnd.nextInt(7).toLong, randString(12))
      }
      val expect = rows.groupBy(_._1).map { case (k, vs) =>
        k -> modelSimhash(vs.map(_._2))
      }
      val got = rows.toDF("k", "tok")
        .repartition(1 + rnd.nextInt(9))
        .groupBy(col("k")).agg(SimHashAgg(col("tok")).as("fp"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expect, s"round $round")
    }
  }

  test("RepetitionStats matches an independent model on random strings") {
    def model(text: String): (Long, Long, Long, Long) = {
      val ws = text.split(" ", -1)
      if (ws.length < 3) return (0L, 0L, 0L, 0L)
      val grams = ws.sliding(3).map(_.mkString(" ")).toVector
      val counts = grams.groupBy(identity).view.mapValues(_.size.toLong)
      (grams.size.toLong, counts.size.toLong, counts.values.max,
        counts.values.filter(_ > 1).sum)
    }
    val docs = (1 to 300).map(i => (i.toLong, randString(50)))
    val got = docs.toDF("id", "text")
      .select(col("id"), RepetitionStats(col("text"), 3).as("r"))
      .select(col("id"), col("r.n_grams"), col("r.n_distinct"),
        col("r.top_count"), col("r.dup_occ"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for ((id, text) <- docs)
      assert(got(id) == model(text), s"doc $id: '$text'")
  }

  test("DotProduct matches a strict left-to-right JVM fold on random vectors") {
    val vecs = (1 to 100).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "v")
    val got = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        DotProduct(col("a.v"), col("b.v")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val byId = vecs.toMap
    for (((a, b), d) <- got.take(500)) {
      var acc = 0.0
      val (x, y) = (byId(a), byId(b))
      var i = 0
      while (i < 64) { acc += x(i).toDouble * y(i).toDouble; i += 1 }
      assert(d == acc, s"pair ($a,$b)") // bitwise-equal, not approx
    }
  }
}
