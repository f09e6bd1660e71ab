package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native Aho–Corasick ContainsAny: randomized parity with per-pattern
  * `contains`, fail-link cases (overlapping/nested patterns), distinct
  * counting, interpreted-vs-codegen agreement, and the literal-only
  * pattern contract. */
class ContainsAnySpec extends SparkSpec {
  import spark.implicits._

  private def count(text: String, pats: Seq[String]): Int =
    Seq(text).toDF("t")
      .select(ContainsAny(col("t"), pats).as("n"))
      .head.getInt(0)

  test("fail links: nested and overlapping patterns all fire") {
    // "she" must surface "he" via the suffix link; "his" shares the
    // 'h' trie prefix but must NOT fire
    assert(count("ushers", Seq("he", "she", "his", "hers")) == 3)
    // a pattern that is a suffix of another pattern's interior
    assert(count("abc", Seq("ab", "b", "bc")) == 3)
    assert(count("abc", Seq("abcd")) == 0)
    // match at the very start and very end
    assert(count("xy", Seq("x", "y", "xy")) == 3)
  }

  test("distinct counting: repeats of one pattern count once") {
    assert(count("dup dup dup", Seq("dup", "nope")) == 1)
    assert(count("", Seq("a")) == 0)
  }

  test("randomized parity with per-pattern contains") {
    val rnd = new scala.util.Random(23)
    val alphabet = "abcd"
    def randStr(n: Int) =
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val pats = (1 to 12).map(_ => randStr(1 + rnd.nextInt(4))).distinct
    val texts = (1 to 200).map(_ => randStr(5 + rnd.nextInt(60)))
    val df = texts.toDF("t")
    val viaNative = df.select(ContainsAny(col("t"), pats).as("n"))
      .as[Int].collect().toSeq
    val naive = pats.map(p =>
        when(col("t").contains(p), 1).otherwise(0))
      .reduce(_ + _)
    val viaContains = df.select(naive.as("n")).as[Int].collect().toSeq
    assert(viaNative == viaContains)
  }

  test("interpreted eval equals codegen result") {
    val pats = Seq("he", "she", "hers")
    val df = Seq("ushers he x", "none").toDF("t")
    val viaCodegen = df.select(ContainsAny(col("t"), pats))
      .as[Int].collect().toSeq
    val conf = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val interp = df.select(ContainsAny(col("t"), pats))
        .as[Int].collect().toSeq
      assert(interp == viaCodegen)
    } finally spark.conf.set(conf, prev)
  }

  test("fromFrame equals the literal path and dedups the pattern table") {
    val pats = Seq("he", "she", "she", "hers", "he").toDF("pat") // dups
    val df = Seq("ushers he x", "none", "she said").toDF("t")
    val viaFrame = df.select(
      ContainsAny.fromFrame(col("t"), pats, "pat").as("n"))
      .as[Int].collect().toSeq
    val viaLit = df.select(
      ContainsAny(col("t"), Seq("he", "she", "hers")).as("n"))
      .as[Int].collect().toSeq
    assert(viaFrame == viaLit)
  }

  test("fromFrame fails loudly past the pattern cap, before collecting") {
    val key = ContainsAny.MaxPatternsKey
    val pats = (1 to 10).map(i => s"p$i").toDF("pat")
    spark.conf.set(key, "4")
    try {
      val err = intercept[IllegalArgumentException] {
        ContainsAny.fromFrame(col("t"), pats, "pat")
      }
      assert(err.getMessage.contains(key) &&
        err.getMessage.contains("q63_decontaminate"))
      spark.conf.set(key, "10")
      // at the cap it builds; the automaton sees all 10 patterns
      val n = Seq("p1 p7 p10").toDF("t")
        .select(ContainsAny.fromFrame(col("t"), pats, "pat").as("n"))
        .head.getInt(0)
      assert(n == 3)
    } finally spark.conf.unset(key)
  }

  test("the handle ships patterns only and rebuilds across serialization") {
    // the executor-shipping contract: java-serialize the handle (what
    // the task binary does), rebuild on the other side, same counts —
    // and the automaton field itself must be transient (never written)
    val h = new ContainsAny.AcHandle(Array("he", "she", "hers"))
    assert(h.ac.countDistinct("ushers") == 3)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(h); oos.close()
    val bytes = bos.toByteArray
    // a serialized ~3-pattern handle must be tiny — if the built trie
    // ever rides along, this blows up by orders of magnitude
    assert(bytes.length < 4096, s"handle serialized to ${bytes.length}B")
    val ois = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val h2 = ois.readObject().asInstanceOf[ContainsAny.AcHandle]
    assert(h2.ac.countDistinct("ushers") == 3)
    assert(h2.ac.countDistinct("none") == 0)
  }

  test("a non-literal pattern column is rejected") {
    val df = Seq(("abc", Seq("a"))).toDF("t", "pats")
    val err = intercept[Exception] {
      df.select(org.apache.spark.sql.graft.bridge.column(
        ContainsAny(
          org.apache.spark.sql.graft.bridge.expression(col("t")),
          org.apache.spark.sql.graft.bridge.expression(col("pats")))))
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists(t => Option(t.getMessage)
      .exists(_.contains("must be a literal"))))
  }
}
