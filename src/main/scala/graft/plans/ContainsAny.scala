package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-pattern substring counter: how many DISTINCT patterns
  * from a fixed list occur in `text`, via one Aho–Corasick pass
  * (Aho & Corasick '75) over the document. The blocklist/flag-phrase
  * primitive of a corpus-curation pipeline: with P patterns the naive
  * `contains(text, p1) + contains(text, p2) + …` plan re-scans every
  * document P times — at a 10k-phrase blocklist over 100 TB that is
  * 10,000 corpus passes — while the automaton pays O(|text|) per
  * document REGARDLESS of P (the per-char work is one goto/fail walk).
  *
  * The pattern list must be FOLDABLE (a literal — blocklists are
  * configuration, not data): the automaton is built once at plan time
  * and ships to executors as a codegen reference object; the generated
  * code is a single static kernel call (the NearestCentroid lesson —
  * inline multi-statement blocks get split across helper methods by the
  * non-WSCG generators and Janino dangles). Matching is exact
  * case-sensitive substring semantics — identical to `contains` per
  * pattern, which is what keeps the DuckDB oracle a plain CASE sum.
  */
case class ContainsAny(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_contains_any"

  private def checkTypes(): Unit = {
    require(left.dataType == StringType,
      s"graft_contains_any expects a string text column, got ${left.dataType}")
    right.dataType match {
      case ArrayType(StringType, _) => ()
      case other => throw new IllegalArgumentException(
        s"graft_contains_any expects array<string> patterns, got $other")
    }
    require(right.foldable,
      "graft_contains_any: the pattern list must be a literal " +
        "(blocklists are configuration; a per-row pattern column would " +
        "rebuild the automaton per row)")
  }

  @transient private lazy val handle: ContainsAny.AcHandle = {
    checkTypes()
    val v = right.eval(null)
    require(v != null, "graft_contains_any: null pattern literal")
    val arr = v.asInstanceOf[ArrayData]
    val pats = (0 until arr.numElements())
      .map(i => arr.getUTF8String(i).toString).toArray
    require(pats.nonEmpty && pats.forall(_.nonEmpty),
      "graft_contains_any: patterns must be non-empty strings")
    new ContainsAny.AcHandle(pats)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    handle.ac.countDistinct(a.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acHandle", handle,
      classOf[ContainsAny.AcHandle].getName)
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = $acRef.ac().countDistinct($a.toString());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ContainsAny =
    copy(left = newLeft, right = newRight)
}

object ContainsAny {
  /** Column-API entry point. */
  def apply(text: Column, patterns: Seq[String]): Column =
    org.apache.spark.sql.graft.bridge.column(ContainsAny(
      org.apache.spark.sql.graft.bridge.expression(text),
      org.apache.spark.sql.graft.bridge.expression(
        org.apache.spark.sql.functions.typedlit(patterns))))

  /** Fail-loud ceiling on from-frame pattern collection (distinct
    * patterns). Overridable per session via `graft.containsAny
    * .maxPatterns`. 250k patterns ≈ 25 MB of plan-time strings +
    * a same-order automaton — comfortably broadcastable; a blocklist
    * past it should go through the distributed gram join (q63) instead
    * of a plan-time automaton. */
  private[graft] val MaxPatternsKey = "graft.containsAny.maxPatterns"
  private[graft] val MaxPatternsDefault = 250000L

  /** Build the scan from a PATTERN TABLE instead of a literal — the
    * decontamination shape, where the blocklist is data (q63's
    * test-split grams, an eval-benchmark phrase table) rather than
    * configuration. The distinct patterns are collected at plan-build
    * time under a fail-loud cap (the IncrementalBpe doctrine: a bound
    * that is ENFORCED distributed before anything reaches the driver,
    * never assumed), sorted so the embedded literal — and therefore
    * the plan — is deterministic whatever the frame's partitioning.
    * `patterns` must be a one-column-usable frame of non-empty strings. */
  def fromFrame(text: Column, patterns: org.apache.spark.sql.DataFrame,
      patternCol: String): Column = {
    val s = patterns.sparkSession
    val max = s.conf.get(MaxPatternsKey, MaxPatternsDefault.toString).toLong
    val pats = patterns
      .select(org.apache.spark.sql.functions.col(patternCol).as("p"))
      .distinct().persist()
    try {
      val n = pats.count() // gates BEFORE the collect, distributed
      require(n > 0L,
        "graft_contains_any.fromFrame: the pattern frame is empty - an " +
          "empty blocklist matches nothing; if 'no eval split' is a " +
          "legitimate state for the caller, branch before building the " +
          "automaton (the q218 shape)")
      require(n <= max,
        s"graft_contains_any.fromFrame: $n distinct patterns exceeds the " +
          s"plan-time automaton cap $max (conf $MaxPatternsKey). A " +
          "blocklist this large is corpus-shaped: use the distributed " +
          "gram join (q63_decontaminate) instead of a broadcast automaton.")
      val arr = pats.orderBy("p").collect().map(_.getString(0))
      require(arr.forall(p => p != null && p.nonEmpty),
        "graft_contains_any.fromFrame: the pattern column contains " +
          "NULL or empty strings - filter them out; they cannot match")
      apply(text, arr.toSeq)
    } finally pats.unpersist(blocking = false)
  }

  /** What actually ships to executors: the PATTERN STRINGS (MBs), not
    * the built automaton (a ~10^6-node object graph at a from-frame
    * gram blocklist). The task binary is deserialized PER TASK, so
    * shipping the trie cost ~0.4 s × every task of the stage — measured
    * 14.6 s of a 16.4 s q218 run at 32 tasks — where the handle costs
    * one pattern-array decode per task and ONE build per JVM: the
    * automaton rebuilds through a fingerprint-keyed cache that every
    * later task (and every later query over the same blocklist) hits.
    * The cache holds at most [[AcCacheMaxEntries]] automatons: a
    * long-lived executor serving REFRESHED blocklists (a new pattern
    * set per day/corpus) must not accumulate one ~cap-sized trie per
    * generation forever, so crossing the bound evicts the
    * LEAST-RECENTLY-USED entry — a single stale trie leaves, every
    * other live blocklist keeps its automaton (clearing everything
    * would make 9+ rotating blocklists rebuild their multi-second
    * tries on every insertion — ADVICE r11). */
  final class AcHandle(val patterns: Array[String]) extends Serializable {
    @transient lazy val ac: Ac = cachedAc(patterns)
  }

  private val AcCacheMaxEntries = 8
  // access-order LinkedHashMap = LRU; all access synchronized on the map
  // (automaton builds are seconds, the lock is nanoseconds — and the
  // build itself runs OUTSIDE the lock so concurrent distinct blocklists
  // don't serialize their builds; at worst two tasks of the SAME new
  // blocklist build it twice and one wins).
  private val acCache =
    new java.util.LinkedHashMap[String, Ac](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Ac]): Boolean =
        size() > AcCacheMaxEntries
    }

  private def cachedAc(patterns: Array[String]): Ac = {
    // SHA-256, not MD5: patterns come from untrusted corpus data
    // (eval-split grams), and MD5 collisions are constructible — two
    // distinct blocklists must never alias to one automaton (ADVICE r11)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    patterns.foreach { p =>
      val b = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      // length-prefix each pattern: a bare separator byte would let
      // NUL-bearing pattern lists collide (["a\0b","c"] vs ["a","b\0c"])
      md.update(java.nio.ByteBuffer.allocate(4).putInt(b.length).array())
      md.update(b)
    }
    val key = java.util.Base64.getEncoder.encodeToString(md.digest()) +
      ":" + patterns.length
    val hit = acCache.synchronized(acCache.get(key))
    if (hit != null) hit
    else {
      val built = new Ac(patterns)
      acCache.synchronized {
        val raced = acCache.get(key)
        if (raced != null) raced
        else { acCache.put(key, built); built }
      }
    }
  }

  /** Aho–Corasick automaton over UTF-16 chars: goto tries + BFS fail
    * links + dictionary-link output sets. Built once per plan with
    * per-node HashMaps, then FROZEN into parallel sorted arrays
    * (char keys + int targets per node): a from-frame gram blocklist
    * can reach ~10^5 patterns / ~10^6 trie nodes, and a HashMap per
    * node at that size is hundreds of MB of boxed entries shipped to
    * every executor where the array form is tens — and the hot-loop
    * transition becomes a binary search over a char array instead of a
    * boxed-Character hash probe. Serializable = the frozen arrays. */
  final class Ac(patterns: Array[String]) extends Serializable {
    private val nPatterns = patterns.length
    // frozen form: per node a sorted char[] + parallel next[] pair,
    // fail link, and the collapsed output set (pattern ids)
    private val (keys, nxt, fail, out) = Ac.build(patterns)

    /** Child of `state` on `ch`, or -1 — binary search over the node's
      * sorted key array. */
    private def child(state: Int, ch: Char): Int = {
      val ks = keys(state)
      var lo = 0
      var hi = ks.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = ks(mid)
        if (c == ch) return nxt(state)(mid)
        else if (c < ch) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    /** Number of DISTINCT patterns occurring in `text`. */
    def countDistinct(text: String): Int = {
      val found = new Array[Boolean](nPatterns)
      var n = 0
      var state = 0
      var i = 0
      while (i < text.length && n < nPatterns) {
        val ch = text.charAt(i)
        var c = child(state, ch)
        while (c < 0 && state != 0) { state = fail(state); c = child(state, ch) }
        state = if (c < 0) 0 else c
        val os = out(state)
        var j = 0
        while (j < os.length) {
          val pid = os(j)
          if (!found(pid)) { found(pid) = true; n += 1 }
          j += 1
        }
        i += 1
      }
      n
    }
  }

  private object Ac {
    /** Trie + BFS fail-link construction (HashMap-per-node while
      * building), frozen to (keys, next, fail, out) parallel arrays. */
    def build(patterns: Array[String])
        : (Array[Array[Char]], Array[Array[Int]], Array[Int],
           Array[Array[Int]]) = {
      val children =
        scala.collection.mutable.ArrayBuffer(
          scala.collection.mutable.HashMap.empty[Char, Int])
      val failB = scala.collection.mutable.ArrayBuffer(0)
      val outB = scala.collection.mutable.ArrayBuffer(List.empty[Int])

      patterns.zipWithIndex.foreach { case (p, pid) =>
        var v = 0
        p.foreach { ch =>
          v = children(v).getOrElseUpdate(ch, {
            children += scala.collection.mutable.HashMap.empty[Char, Int]
            failB += 0
            outB += Nil
            children.size - 1
          })
        }
        outB(v) = pid :: outB(v)
      }
      // BFS fail links; merge the fail target's output set (dictionary
      // links collapsed eagerly — match sets are tiny here)
      val queue = scala.collection.mutable.Queue.empty[Int]
      children(0).valuesIterator.foreach { c => failB(c) = 0; queue += c }
      while (queue.nonEmpty) {
        val v = queue.dequeue()
        children(v).foreach { case (ch, c) =>
          var f = failB(v)
          while (f != 0 && !children(f).contains(ch)) f = failB(f)
          failB(c) = children(f).get(ch).filter(_ != c).getOrElse(0)
          outB(c) = outB(c) ::: outB(failB(c))
          queue += c
        }
      }
      // freeze: drop the HashMaps, keep sorted parallel arrays
      val n = children.size
      val k = new Array[Array[Char]](n)
      val x = new Array[Array[Int]](n)
      val o = new Array[Array[Int]](n)
      var i = 0
      while (i < n) {
        val entries = children(i).toArray.sortBy(_._1)
        k(i) = entries.map(_._1)
        x(i) = entries.map(_._2)
        o(i) = outB(i).toArray
        i += 1
      }
      (k, x, failB.toArray, o)
    }
  }
}
