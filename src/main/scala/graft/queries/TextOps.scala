package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators over the `documents` table (north-star
  * extension class): language ID (n-gram/stopword heuristic), quality
  * scoring, token counting, and document fingerprinting.
  *
  * Every formula is written with engine-portable arithmetic (length/replace
  * counting, double division, md5) so the DuckDB oracle is bit-exact.
  * Scale note: all of these are embarrassingly parallel per-row projections
  * — no shuffle at all; at 100 TB they run at scan speed and stay inside
  * WholeStageCodegen.
  */
object TextOps {

  /** q130's merge fold: greedy leftmost-non-overlapping application of
    * the (lhs, rhs) pair to the symbol list `ss`. The lambda vars are
    * acc/x; lhs/rhs resolve to the broadcast best-pair columns of the
    * crossJoined row. Shared with WarehouseOpsSpec's adversarial and
    * property tests so the tested string IS the executed string (a
    * private copy in the spec would keep passing after an edit here). */
  private[graft] val bpeFoldCase: String =
    """aggregate(slice(ss, 2, size(ss) - 1), ss[0], (acc, x) -> CASE
      |  WHEN x = rhs AND (acc = lhs OR (length(acc) > length(lhs)
      |    AND substr(acc, length(acc) - length(lhs) + 1) = lhs
      |    AND substr(acc, length(acc) - length(lhs), 1) = ' '))
      |  THEN substr(acc, 1, length(acc) - length(lhs)) || lhs || rhs
      |  ELSE acc || ' ' || x END)""".stripMargin

  private val BpeRounds = 4 // q130/q149 merge rounds (must precede specs:
                            // a forward-referenced val reads 0 mid-init)

  /** occurrences of `pat` in padded text, as an expression string usable in
    * both engines (portable: length/replace only). */
  private def occSql(pat: String): String =
    s"(length(padded) - length(replace(padded, '$pat', ''))) / ${pat.length}"

  /** q197/q204's shared hashed-feature score — Σ over tokens of
    * (md5-16-bit − 32768), one exact BIGINT per document. ONE
    * definition per engine so the gate and the calibration report can
    * never disagree on the score (the flagCumQty anti-drift rule). */
  private val classifierScoreSql =
    """list_sum(list_transform(string_split(text, ' '), t ->
      |      CAST(CAST(('0x' || substr(md5(t), 1, 4)) AS INTEGER)
      |        - 32768 AS BIGINT)))""".stripMargin

  private def classifierScore: org.apache.spark.sql.Column =
    expr("aggregate(split(text, ' '), 0L, (acc, t) -> acc + " +
      "CAST(CAST(conv(substring(md5(t), 1, 4), 16, 10) AS INT) " +
      "- 32768 AS BIGINT))")

  /** The q197/q227 classifier surface as ONE projection — (doc_id, si,
    * heur): hashed-feature score plus the stopword-density heuristic
    * label. Shared by q227's curve and the IncrementalClassifierPr
    * streaming monitor so the two can never disagree on what is being
    * graded (the classifierScoreSql anti-drift rule). */
  private[graft] def scoredDocs(docs: DataFrame): DataFrame = {
    def occDiv(p: String) =
      s"(length(padded) - length(replace(padded, '$p', ''))) div ${p.length}"
    docs
      .withColumn("padded", concat(lit(" "), col("text"), lit(" ")))
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        classifierScore.as("si"),
        expr(s"${occDiv(" the ")} + ${occDiv(" a ")}").as("n_stop"))
      .select(col("doc_id"), col("si"),
        when(col("n_stop") * 10 >= col("n_tok"), 1L).otherwise(0L)
          .as("heur"))
  }

  private val langScores = Seq(
    "en" -> Seq(" the ", " a "),
    "de" -> Seq(" der ", " die ", " und "),
    "fr" -> Seq(" le ", " la ", " et "),
    "es" -> Seq(" el ", " los ", " y ")
  )

  private val scoreCols: String = langScores.map { case (lang, pats) =>
    pats.map(occSql).mkString(" + ") + s" AS s_$lang"
  }.mkString(",\n  ")

  // Deterministic argmax with fixed tiebreak order en > de > fr > es > zh.
  private val predCase: String =
    """CASE
      | WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
      | WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_es THEN 'de'
      | WHEN s_fr > 0 AND s_fr >= s_es THEN 'fr'
      | WHEN s_es > 0 THEN 'es'
      | ELSE 'zh' END""".stripMargin

  /** The q31 labeler as ONE projection — (doc_id, lang, pred) — shared
    * by q31 and its audits (q233 kappa, q236 macro-F1), so the graders
    * can never desynchronize from the labeler they grade (the
    * scoredDocs anti-drift rule). */
  private def langPredictions(docs: DataFrame): DataFrame =
    docs
      .withColumn("padded", concat(lit(" "), col("text"), lit(" ")))
      .select(Seq(col("doc_id"), col("lang")) ++ langScores.map {
        case (lang, pats) =>
          expr(pats.map(occSql).mkString(" + ")).as(s"s_$lang")
      }: _*)
      .select(col("doc_id"), col("lang"), expr(predCase).as("pred"))

  /** DuckDB twin of [[langPredictions]]: a CTE ending in
    * `p(doc_id, lang, pred)`. */
  private val langPredCteSql: String =
    s"""p AS (SELECT doc_id, lang, $predCase AS pred
       |  FROM (SELECT doc_id, lang, $scoreCols
       |        FROM (SELECT doc_id, lang, ' ' || text || ' ' AS padded
       |              FROM documents)))""".stripMargin

  val specs: Seq[QuerySpec] = Seq(

    // ------------------------------------------------------------------
    // Language ID via stopword-occurrence scoring (pure projection).
    QuerySpec.sqlBacked("q31_text_langid",
      s"""WITH $langPredCteSql
         |SELECT doc_id, pred,
         |  CASE WHEN pred = lang THEN 1 ELSE 0 END AS hit
         |FROM p ORDER BY doc_id""".stripMargin) { (s, dir) =>
      langPredictions(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("pred"),
          when(col("pred") === col("lang"), 1).otherwise(0).as("hit"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // Quality scoring: token count, mean word length, stopword ratio,
    // composite score — all double arithmetic in identical op order.
    QuerySpec.sqlBacked("q32_text_quality",
      """SELECT doc_id, n_tok,
        |  length(replace(text, ' ', '')) / n_tok AS avg_wlen,
        |  n_stop / n_tok AS stop_ratio,
        |  0.5 * (n_stop / n_tok) + 0.5 * least(n_tok / 100, 1) AS score
        |FROM (SELECT doc_id, text,
        |        len(string_split(text, ' ')) AS n_tok,
        |        (length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5
        |          + (length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ''))) / 3
        |          AS n_stop
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("n_tok", size(split(col("text"), " ")))
        .withColumn("padded", concat(lit(" "), col("text"), lit(" ")))
        .withColumn("n_stop",
          expr(s"${occSql(" the ")} + ${occSql(" a ")}"))
        .select(col("doc_id"), col("n_tok"),
          (length(regexp_replace(col("text"), " ", "")) / col("n_tok")).as("avg_wlen"),
          (col("n_stop") / col("n_tok")).as("stop_ratio"),
          (lit(0.5) * (col("n_stop") / col("n_tok")) +
            lit(0.5) * least(col("n_tok") / lit(100), lit(1))).as("score"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // Token counting: whitespace tokens, alnum regex tokens, and BPE-ish
    // fixed-width subword pieces.
    QuerySpec.sqlBacked("q33_text_tokens",
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_ws,
        |  len(regexp_extract_all(text, '[a-z0-9]+')) AS n_alnum,
        |  len(regexp_extract_all(text, '[a-z0-9]{1,4}')) AS n_subtok
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_ws"),
          size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).as("n_alnum"),
          size(regexp_extract_all(col("text"), lit("[a-z0-9]{1,4}"), lit(0))).as("n_subtok"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // Document fingerprinting: md5 of whitespace-normalized text, plus
    // min/max word-3-gram shingle hashes (winnowing-style extrema).
    QuerySpec.sqlBacked("q34_text_fingerprint",
      """WITH sh AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(ws)-1),
        |      i -> md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS h
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |  WHERE len(ws) >= 3)
        |SELECT d.doc_id,
        |  md5(lower(trim(regexp_replace(text, ' +', ' ')))) AS fp,
        |  x.min_sh, x.max_sh
        |FROM documents d
        |JOIN (SELECT doc_id, min(h) AS min_sh, max(h) AS max_sh
        |      FROM sh GROUP BY doc_id) x ON d.doc_id = x.doc_id
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val sh = docs
        .select(col("doc_id"),
          explode(graft.plans.WordShingles(col("text"), 3, distinct = false))
            .as("s3"))
        .select(col("doc_id"), md5(col("s3")).as("h"))
        .groupBy(col("doc_id"))
        .agg(min(col("h")).as("min_sh"), max(col("h")).as("max_sh"))
      docs
        .select(col("doc_id"),
          md5(lower(trim(regexp_replace(col("text"), " +", " ")))).as("fp"))
        .join(sh, "doc_id")
        .select(col("doc_id"), col("fp"), col("min_sh"), col("max_sh"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // Polynomial rolling hash (Rabin-Karp) fingerprinting: a whole-doc
    // hash plus winnowing-style extrema/cardinality over all 8-char-gram
    // hashes. Exact 64-bit modular arithmetic (base 31, mod 1e9+7) in
    // identical fold order, so bit-equal across engines (DuckDB's
    // list_reduce seeds with the first element ≙ Spark aggregate with
    // slice+explicit init). Pure projection — scan-bound at 100 TB.
    QuerySpec.sqlBacked("q49_text_rollhash",
      """SELECT doc_id,
        |  list_reduce(codes, (a, b) -> (a*31 + b) % 1000000007) AS h,
        |  list_min(gs) AS g_min, list_max(gs) AS g_max,
        |  len(list_distinct(gs)) AS n_distinct
        |FROM (
        |  SELECT doc_id, codes,
        |    list_transform(range(1, len(codes) - 6),
        |      i -> list_reduce(codes[i:i+7], (a, b) -> (a*31 + b) % 1000000007)) AS gs
        |  FROM (SELECT doc_id,
        |          list_transform(string_split(text, ''),
        |            c -> CAST(ascii(c) AS BIGINT)) AS codes
        |        FROM documents)
        |  WHERE len(codes) >= 8)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // One native expression ([[graft.plans.RollingHash]]) instead of
      // the per-char code array + per-position aggregate-lambda SQL:
      // the interpreted higher-order functions cost ~5 ms/doc; the
      // codegen'd single-pass loop does identical arithmetic (same fold
      // seeding and mod) ~10x faster. RollingHashSpec proves parity
      // against the SQL formulation property-style.
      Tables.spread(s, dir, "documents")
        .filter(length(col("text")) >= 8)
        .select(col("doc_id"), graft.plans.RollingHash(col("text")).as("r"))
        .select(col("doc_id"), col("r.h").as("h"),
          col("r.g_min").as("g_min"), col("r.g_max").as("g_max"),
          col("r.n_distinct").as("n_distinct"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // TF-IDF-style top term per document: the term with the highest
    // in-doc frequency, tiebroken toward the most distinctive (lowest
    // document frequency) then lexicographically — an integer-exact
    // ranking (no float idf), so the oracle is bit-exact. Scale: tf is
    // one shuffle on (doc, tok) with map-side combine, df one shuffle on
    // tok; the df join shuffles on tok and the final argmax is a window
    // keyed by doc_id — every key is either bounded (doc) or capped by
    // vocabulary size.
    QuerySpec.sqlBacked("q59_tfidf_top_term",
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |              FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |ranked AS (
        |  SELECT doc_id, tok AS term, tf.tf, df.df,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tf.tf DESC, df.df ASC, tok) AS rn
        |  FROM tf JOIN df USING (tok))
        |SELECT doc_id, term, tf, df FROM ranked WHERE rn = 1
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val toks = Tables.spread(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val tf = toks.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val df = toks.groupBy(col("tok"))
        .agg(countDistinct(col("doc_id")).as("df"))
      // argmax via min(struct(-tf, df, term)): lexicographic struct
      // ordering encodes (tf DESC, df ASC, term ASC) and aggregates with
      // map-side partials — no per-doc window sort.
      tf.join(df, "tok")
        .groupBy(col("doc_id"))
        .agg(min(struct((-col("tf")).as("ntf"), col("df"),
          col("tok").as("term"))).as("m"))
        .select(col("doc_id"), col("m.term").as("term"),
          (-col("m.ntf")).as("tf"), col("m.df").as("df"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // Document chunking: fixed 50-token windows with 10-token overlap
    // (stride 40) — the context-window preparation step of a training /
    // RAG pipeline. One row per chunk with its token count and content
    // fingerprint. Pure projection (transform + posexplode), scan-bound;
    // chunk boundaries depend only on the document, so the split is
    // partition- and retry-stable.
    QuerySpec.sqlBacked("q61_doc_chunks",
      """SELECT doc_id, j AS chunk_id,
        |  len(ws[40*j+1 : 40*j+50]) AS n_tok,
        |  md5(array_to_string(ws[40*j+1 : 40*j+50], ' ')) AS chunk_fp
        |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |  unnest(range(0, CAST(ceil(greatest(len(ws) - 10, 1) / 40.0) AS BIGINT)))
        |    AS t(j)
        |ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), posexplode(expr(
          """transform(
            |  sequence(0, CAST(ceil(greatest(size(ws) - 10, 1) / 40.0) AS INT) - 1),
            |  j -> slice(ws, 40*j + 1, 50))""".stripMargin))
          .as(Seq("chunk_id", "chunk")))
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          size(col("chunk")).cast("long").as("n_tok"),
          md5(array_join(col("chunk"), " ")).as("chunk_fp"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // ------------------------------------------------------------------
    // Sequence packing (concat-and-cut): documents concatenated in
    // doc_id order within each source shard, contexts cut every 512
    // tokens, each doc assigned to the bin its first token lands in —
    // the context-window packing step of LLM training-data prep.
    // Per-bin occupancy report. One shuffle keyed by source; the
    // running offset is a per-source window cumsum, so parallelism =
    // shard count — exactly how packing distributes at 100 TB (pack
    // within shards; a global pack order would serialize the corpus).
    QuerySpec.sqlBacked("q71_sequence_packing",
      """WITH t AS (SELECT source, doc_id,
        |        len(string_split(text, ' ')) AS n_tok FROM documents),
        |c AS (SELECT source, doc_id, n_tok,
        |        sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |                         ROWS UNBOUNDED PRECEDING) AS end_off
        |      FROM t)
        |SELECT source, CAST((end_off - n_tok) // 512 AS BIGINT) AS bin_id,
        |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY source, bin_id
        |ORDER BY source, bin_id""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("end_off", sum(col("n_tok")).over(w))
        .select(col("source"), col("doc_id"), col("n_tok"),
          expr("(end_off - n_tok) div 512").as("bin_id"))
        .groupBy(col("source"), col("bin_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("source"), col("bin_id"))
    },

    // ------------------------------------------------------------------
    // Repetition ratio (Gopher-style quality rule): fraction of a doc's
    // word-3-grams that are repeats of an earlier 3-gram. High ratio =
    // boilerplate/spam; training pipelines threshold on it. Counts are
    // exact integers; the one double division at the end is
    // engine-deterministic. Pure projection.
    QuerySpec.sqlBacked("q62_repetition",
      """SELECT doc_id, n_total, n_distinct,
        |  1.0 - CAST(n_distinct AS DOUBLE)/n_total AS dup_ratio
        |FROM (
        |  SELECT doc_id, len(gs) AS n_total,
        |    len(list_distinct(gs)) AS n_distinct
        |  FROM (SELECT doc_id, list_transform(range(1, len(ws)-1),
        |          i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) AS gs
        |        FROM (SELECT doc_id, string_split(text,' ') AS ws
        |              FROM documents)
        |        WHERE len(ws) >= 3))
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          graft.plans.WordShingles(col("text"), 3, distinct = false).as("gs"))
        .filter(size(col("gs")) > 0)
        .select(col("doc_id"),
          size(col("gs")).cast("long").as("n_total"),
          size(array_distinct(col("gs"))).cast("long").as("n_distinct"))
        .select(col("doc_id"), col("n_total"), col("n_distinct"),
          (lit(1.0) - col("n_distinct").cast("double") / col("n_total"))
            .as("dup_ratio"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // Composed quality gate — the keep/drop decision a corpus pipeline
    // ships, combining three Gopher-style rules: word-count bounds,
    // mean word length bounds, and the q62 repetition cap. All counts
    // are integers (mean word length = non-space chars / words, exact
    // on the single-spaced corpus); the two double divisions are single
    // operations, so the verdict and reasons are engine-exact. One
    // scan, pure projection.
    QuerySpec.sqlBacked("q67_quality_gate",
      """SELECT doc_id, n_words, mean_wl, dup_ratio,
        |  (r_len || r_wl || r_rep = '') AS pass,
        |  r_len || r_wl || r_rep AS fail_reasons
        |FROM (
        |  SELECT doc_id, n_words, mean_wl, dup_ratio,
        |    CASE WHEN n_words BETWEEN 20 AND 1000 THEN '' ELSE '[len]' END AS r_len,
        |    CASE WHEN mean_wl >= 3.0 AND mean_wl <= 10.0 THEN '' ELSE '[wordlen]' END AS r_wl,
        |    CASE WHEN dup_ratio <= 0.2 THEN '' ELSE '[repeat]' END AS r_rep
        |  FROM (
        |    SELECT doc_id, len(ws) AS n_words,
        |      CAST(length(text) - (len(ws) - 1) AS DOUBLE) / len(ws) AS mean_wl,
        |      1.0 - CAST(len(list_distinct(gs)) AS DOUBLE)/len(gs) AS dup_ratio
        |    FROM (SELECT doc_id, text, string_split(text, ' ') AS ws,
        |            list_transform(range(1, len(string_split(text, ' '))-1),
        |              i -> string_split(text, ' ')[i] || ' ' ||
        |                   string_split(text, ' ')[i+1] || ' ' ||
        |                   string_split(text, ' ')[i+2]) AS gs
        |          FROM documents)
        |    WHERE len(gs) > 0))
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          split(col("text"), " ").as("ws"),
          graft.plans.WordShingles(col("text"), 3, distinct = false).as("gs"))
        .filter(size(col("gs")) > 0)
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          ((length(col("text")) - (size(col("ws")) - 1)).cast("double") /
            size(col("ws"))).as("mean_wl"),
          (lit(1.0) - size(array_distinct(col("gs"))).cast("double") /
            size(col("gs"))).as("dup_ratio"))
        .select(col("doc_id"), col("n_words"), col("mean_wl"), col("dup_ratio"),
          when(col("n_words").between(20, 1000), "").otherwise("[len]").as("r_len"),
          when(col("mean_wl") >= 3.0 && col("mean_wl") <= 10.0, "")
            .otherwise("[wordlen]").as("r_wl"),
          when(col("dup_ratio") <= 0.2, "").otherwise("[repeat]").as("r_rep"))
        .select(col("doc_id"), col("n_words"), col("mean_wl"), col("dup_ratio"),
          (concat(col("r_len"), col("r_wl"), col("r_rep")) === "").as("pass"),
          concat(col("r_len"), col("r_wl"), col("r_rep")).as("fail_reasons"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // q241: gate ABLATION grid — the inclusion–exclusion audit of the
    // q67 filter stack: one row per (len, wordlen, repeat) fail-bit
    // combination with its doc count and corpus share in exact ppm.
    // q67 ships the per-doc verdict; this is the report a pipeline
    // owner reads before changing the stack — a rule whose failures
    // are fully covered by the other rules' cells (its exclusive cell
    // is ~0) can be dropped for free, and a cell that dominates the
    // drop mass identifies which rule to re-tune first. Same gated
    // base as q67 (docs with at least one 3-gram), same
    // engine-exact rule arithmetic; after the per-doc projection the
    // whole report is ONE 8-key aggregate with map-side combine plus a
    // 1-row total broadcast.
    QuerySpec.sqlBacked("q241_gate_ablation",
      """WITH b AS (
        |  SELECT doc_id, len(ws) AS n_words,
        |    CAST(length(text) - (len(ws) - 1) AS DOUBLE) / len(ws) AS mean_wl,
        |    1.0 - CAST(len(list_distinct(gs)) AS DOUBLE)/len(gs) AS dup_ratio
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws,
        |          list_transform(range(1, len(string_split(text, ' '))-1),
        |            i -> string_split(text, ' ')[i] || ' ' ||
        |                 string_split(text, ' ')[i+1] || ' ' ||
        |                 string_split(text, ' ')[i+2]) AS gs
        |        FROM documents)
        |  WHERE len(gs) > 0),
        |f AS (SELECT doc_id,
        |        CASE WHEN n_words BETWEEN 20 AND 1000 THEN 0 ELSE 1 END
        |          AS fail_len,
        |        CASE WHEN mean_wl >= 3.0 AND mean_wl <= 10.0 THEN 0 ELSE 1 END
        |          AS fail_wl,
        |        CASE WHEN dup_ratio <= 0.2 THEN 0 ELSE 1 END AS fail_rep
        |      FROM b),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM f)
        |SELECT fail_len, fail_wl, fail_rep,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  (1000000 * CAST(count(*) AS BIGINT)) // tot AS share_ppm
        |FROM f, t GROUP BY fail_len, fail_wl, fail_rep, tot
        |ORDER BY fail_len, fail_wl, fail_rep""".stripMargin) { (s, dir) =>
      val f = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          split(col("text"), " ").as("ws"),
          graft.plans.WordShingles(col("text"), 3, distinct = false).as("gs"))
        .filter(size(col("gs")) > 0)
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          ((length(col("text")) - (size(col("ws")) - 1)).cast("double") /
            size(col("ws"))).as("mean_wl"),
          (lit(1.0) - size(array_distinct(col("gs"))).cast("double") /
            size(col("gs"))).as("dup_ratio"))
        .select(col("doc_id"),
          when(col("n_words").between(20, 1000), 0).otherwise(1)
            .as("fail_len"),
          when(col("mean_wl") >= 3.0 && col("mean_wl") <= 10.0, 0)
            .otherwise(1).as("fail_wl"),
          when(col("dup_ratio") <= 0.2, 0).otherwise(1).as("fail_rep"))
      Dedup.withScratch(f) {
        val tot = f.agg(count(lit(1)).cast("long").as("tot"))
        f.groupBy(col("fail_len"), col("fail_wl"), col("fail_rep"))
          .agg(count(lit(1)).cast("long").as("n_docs"))
          .crossJoin(broadcast(tot))
          .select(col("fail_len"), col("fail_wl"), col("fail_rep"),
            col("n_docs"),
            expr("(1000000 * n_docs) div tot").as("share_ppm"))
          .orderBy(col("fail_len"), col("fail_wl"), col("fail_rep"))
      }
    },

    // ------------------------------------------------------------------
    // Global sequence-id assignment: every document gets a contiguous
    // 0-based ordinal in (source, doc_id) order — shard naming /
    // curriculum ordering. The declarative formulation (row_number with
    // no PARTITION BY) collapses onto one task; the operator
    // ([[graft.operators.GlobalIndex]]) keeps the sort distributed:
    // range-shuffle sort, then per-partition counts prefix-summed on
    // the driver (#partitions longs, not rows) stamp offset + local
    // position with no second shuffle.
    QuerySpec.sqlBacked("q73_global_index",
      """SELECT CAST(row_number() OVER (ORDER BY source, doc_id) - 1
        |         AS BIGINT) AS seq_id,
        |       doc_id, source
        |FROM documents ORDER BY seq_id""".stripMargin) { (s, dir) =>
      graft.operators.GlobalIndex.assign(
          Tables(s, dir, "documents").select(col("doc_id"), col("source")),
          Seq(col("source"), col("doc_id")))
        .select(col("seq_id"), col("doc_id"), col("source"))
        .orderBy(col("seq_id"))
    },

    // ------------------------------------------------------------------
    // Vocabulary statistics (Zipf head): top-30 tokens by corpus
    // frequency with rank and cumulative coverage of all token
    // occurrences. Scale shape: one count-by-token aggregate (map-side
    // partials), a bounded top-k (TakeOrderedAndProject — only k rows
    // reach the driver side of the sort), the total as a broadcast
    // one-row aggregate, and the cumulative window runs over 30 rows.
    // A full-vocab ranking window would shuffle millions of tokens to
    // one task; bounding to the head keeps every stage scan-sized.
    QuerySpec.sqlBacked("q74_vocab_zipf",
      """WITH tf AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT tok, count(*) AS n FROM tf GROUP BY tok),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cnt),
        |top AS (SELECT tok, n FROM cnt ORDER BY n DESC, tok LIMIT 30)
        |SELECT CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT)
        |         AS rank,
        |       tok, CAST(n AS BIGINT) AS n,
        |       CAST(sum(n) OVER (ORDER BY n DESC, tok
        |                         ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |         / total AS coverage
        |FROM top, tot ORDER BY rank""".stripMargin) { (s, dir) =>
      // scratch-cache the vocab counts (Dedup.withScratch — one
      // lifecycle contract repo-wide): top and tot both consume them,
      // and left lazy each would re-run the corpus scan + token shuffle
      val cnt = Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      Dedup.withScratch(cnt) {
      val top = cnt.orderBy(col("n").desc, col("tok")).limit(30)
      val tot = cnt.agg(sum(col("n")).as("total"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("tok"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      top.crossJoin(broadcast(tot))
        .select(row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("n").desc, col("tok"))).cast("long").as("rank"),
          col("tok"), col("n"),
          (sum(col("n")).over(w).cast("double") / col("total"))
            .as("coverage"))
        .orderBy(col("rank"))
      }
    },

    // ------------------------------------------------------------------
    // Context-length utilization: for candidate sequence lengths L in
    // {64,128,256,512}, what the one-doc-per-sequence strategy wastes —
    // tokens truncated (doc longer than L) and slots padded (doc
    // shorter) — the report that picks a context length before
    // committing a 100 TB tokenization run. One scan, the 4 lengths
    // explode from a constant array, one 4-row aggregate; utilization
    // is a single double division of exact integer sums. (q71's
    // concat-and-cut packing is the zero-padding alternative; this
    // quantifies what that buys.)
    QuerySpec.sqlBacked("q90_context_utilization",
      """SELECT L, count(*) AS n_docs,
        |  CAST(sum(least(n_tok, L)) AS BIGINT) AS tokens_kept,
        |  CAST(sum(greatest(n_tok - L, 0)) AS BIGINT) AS tokens_truncated,
        |  CAST(sum(greatest(L - n_tok, 0)) AS BIGINT) AS slots_padded,
        |  CAST(CAST(sum(least(n_tok, L)) AS BIGINT) AS DOUBLE)
        |    / (count(*) * L) AS utilization
        |FROM (SELECT len(string_split(text, ' ')) AS n_tok FROM documents),
        |     unnest([64, 128, 256, 512]) AS t(L)
        |GROUP BY L ORDER BY L""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(size(split(col("text"), " ")).cast("long").as("n_tok"),
          explode(typedLit(Seq(64L, 128L, 256L, 512L))).as("L"))
        .groupBy(col("L"))
        .agg(count(lit(1)).as("n_docs"),
          sum(least(col("n_tok"), col("L"))).as("tokens_kept"),
          sum(greatest(col("n_tok") - col("L"), lit(0L)))
            .as("tokens_truncated"),
          sum(greatest(col("L") - col("n_tok"), lit(0L)))
            .as("slots_padded"))
        .select(col("L"), col("n_docs"), col("tokens_kept"),
          col("tokens_truncated"), col("slots_padded"),
          (col("tokens_kept").cast("double") / (col("n_docs") * col("L")))
            .as("utilization"))
        .orderBy(col("L"))
    },

    // ------------------------------------------------------------------
    // Token co-occurrence with exact lift: the 30 strongest
    // document-level token pairs, lift = P(x,y)/(P(x)P(y)) computed as
    // ONE double division of exact integer products (log-PMI would
    // hinge on libm parity between engines; lift doesn't). Pair
    // generation is a per-doc self-join on distinct tokens — bounded by
    // tokens-per-doc, not vocabulary — and the result is top-k bounded
    // before anything reaches the driver.
    QuerySpec.sqlBacked("q91_cooccurrence",
      """WITH d AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
        |    AS tok FROM documents),
        |nx AS (SELECT tok, count(*) AS n FROM d GROUP BY tok),
        |nn AS (SELECT count(*) AS n_docs FROM documents),
        |pairs AS (
        |  SELECT a.tok AS t1, b.tok AS t2, count(*) AS n_xy
        |  FROM d a JOIN d b ON a.doc_id = b.doc_id AND a.tok < b.tok
        |  GROUP BY a.tok, b.tok
        |  ORDER BY n_xy DESC, t1, t2 LIMIT 30)
        |SELECT t1, t2, n_xy,
        |  CAST(n_xy * n_docs AS DOUBLE)
        |    / CAST(x.n * y.n AS DOUBLE) AS lift
        |FROM pairs JOIN nx x ON x.tok = t1 JOIN nx y ON y.tok = t2, nn
        |ORDER BY n_xy DESC, t1, t2""".stripMargin) { (s, dir) =>
      // scratch-cache the (doc, token) exploded relation: the pair
      // self-join and nx both consume it (same reuse fix as q74); the
      // corpus size comes from the BASE table — doc_id is the key and
      // every doc emits >= 1 token, so a distinct-count over the token
      // relation would shuffle |tokens| rows to recover count(*)
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
      Dedup.withScratch(d) {
      val nx = d.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      val nn = Tables(s, dir, "documents")
        .agg(count(lit(1)).as("n_docs"))
      d.select(col("doc_id"), col("tok").as("t1"))
        .join(d.select(col("doc_id"), col("tok").as("t2")), "doc_id")
        .filter(col("t1") < col("t2"))
        .groupBy(col("t1"), col("t2"))
        .agg(count(lit(1)).as("n_xy"))
        .orderBy(col("n_xy").desc, col("t1"), col("t2")).limit(30)
        .join(nx.select(col("tok").as("t1"), col("n").as("nx1")), "t1")
        .join(nx.select(col("tok").as("t2"), col("n").as("nx2")), "t2")
        .crossJoin(broadcast(nn))
        .select(col("t1"), col("t2"), col("n_xy"),
          ((col("n_xy") * col("n_docs")).cast("double") /
            (col("nx1") * col("nx2")).cast("double")).as("lift"))
        .orderBy(col("n_xy").desc, col("t1"), col("t2"))
      }
    },

    // ------------------------------------------------------------------
    // Seeded epoch shuffle: the training order for one epoch — a
    // pseudo-random but REPRODUCIBLE permutation of the corpus,
    // assigned as contiguous positions by [[graft.operators.GlobalIndex]]
    // over a salted per-doc hash (new seed = new epoch = new
    // permutation; same seed = byte-identical order across reruns and
    // engines — what resumable training needs). Same distributed-sort
    // shape as q73; a driver-side shuffle of 100 TB of ids is the
    // anti-pattern this replaces.
    QuerySpec.sqlBacked("q92_epoch_shuffle",
      """SELECT CAST(row_number() OVER (
        |         ORDER BY md5('epoch7:' || CAST(doc_id AS VARCHAR)),
        |                  doc_id) - 1 AS BIGINT) AS pos,
        |       doc_id
        |FROM documents ORDER BY pos""".stripMargin) { (s, dir) =>
      graft.operators.GlobalIndex.assign(
          Tables(s, dir, "documents")
            .select(col("doc_id"),
              md5(concat(lit("epoch7:"), col("doc_id").cast("string")))
                .as("h")),
          Seq(col("h"), col("doc_id")), outCol = "pos")
        .select(col("pos"), col("doc_id"))
        .orderBy(col("pos"))
    },

    // ------------------------------------------------------------------
    // Tokenizer fertility by language: chars/token and subtokens/token
    // per lang — the report that sizes a tokenizer's vocab against a
    // multilingual corpus before a 100 TB tokenization run (fertility
    // differences across languages are the classic vocab-allocation
    // signal). One scan, one tiny per-lang aggregate; ratios are single
    // double divisions of exact integer sums (engine-exact, no
    // accumulation-order exposure).
    QuerySpec.sqlBacked("q96_fertility_by_lang",
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks,
        |  CAST(sum(len(regexp_extract_all(text, '[a-z0-9]{1,4}'))) AS BIGINT)
        |    AS subtoks,
        |  CAST(sum(n_chars) AS DOUBLE)
        |    / sum(len(string_split(text, ' '))) AS chars_per_tok,
        |  CAST(sum(len(regexp_extract_all(text, '[a-z0-9]{1,4}'))) AS DOUBLE)
        |    / sum(len(string_split(text, ' '))) AS fertility
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"),
          sum(size(split(col("text"), " "))).as("toks"),
          sum(size(regexp_extract_all(col("text"), lit("[a-z0-9]{1,4}"), lit(0))))
            .as("subtoks"))
        .select(col("lang"), col("n_docs"), col("chars"), col("toks"),
          col("subtoks"),
          (col("chars").cast("double") / col("toks")).as("chars_per_tok"),
          (col("subtoks").cast("double") / col("toks")).as("fertility"))
        .orderBy(col("lang"))
    },

    // ------------------------------------------------------------------
    // Token-rarity score: per document, the mean corpus document
    // frequency of its token instances — the integer-exact commonness
    // signal a quality filter ranks on (the cross-entropy-against-
    // unigram-LM score without the log, whose libm parity no oracle
    // could pin; the mean-df ranking is monotone in the same tail).
    // is_rare flags docs whose mean df is under 20% of the corpus via
    // integer cross-multiplication (5*sum_df < n_tok*n_docs) — no
    // division touches the decision. Scale: df is one token-keyed
    // aggregate (vocab-bounded), the df join shuffles token instances
    // once (AQE promotes the vocab side to broadcast), and the per-doc
    // aggregate is the second and last shuffle; the mean is one double
    // division at the end.
    QuerySpec.sqlBacked("q100_token_rarity",
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |              FROM documents),
        |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks
        |       GROUP BY tok),
        |tot AS (SELECT count(*) AS n_docs FROM documents),
        |agg AS (SELECT doc_id, count(*) AS n_tok,
        |          CAST(sum(df) AS BIGINT) AS sum_df
        |        FROM toks JOIN df USING (tok) GROUP BY doc_id)
        |SELECT doc_id, n_tok, sum_df,
        |       CAST(sum_df AS DOUBLE) / n_tok AS mean_df,
        |       CASE WHEN 5 * sum_df < n_tok * n_docs THEN 1 ELSE 0 END
        |         AS is_rare
        |FROM agg, tot ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val toks = Tables.spread(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val df = toks.groupBy(col("tok"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val tot = Tables(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
      toks.join(df, "tok")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"), sum(col("df")).as("sum_df"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("n_tok"), col("sum_df"),
          (col("sum_df").cast("double") / col("n_tok")).as("mean_df"),
          when(lit(5) * col("sum_df") < col("n_tok") * col("n_docs"), 1)
            .otherwise(0).as("is_rare"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // Corpus bigram table — the merge-candidate statistic a BPE/unigram
    // tokenizer trainer computes first (and the bigram LM numerator):
    // count every ADJACENT token pair. Distinct from q91, which scores
    // doc-level co-presence; here order and adjacency matter. Classic
    // word-count shape at 100 TB: the explode amplifies rows but
    // map-side partial aggregation collapses the shuffle to <= vocab^2
    // keys, so the wire cost is bounded by the vocabulary, not the
    // corpus. Output bounded by the same vocab^2 (the q91 argument).
    QuerySpec.sqlBacked("q106_bigram_counts",
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2)
        |SELECT ws[i] AS w1, ws[i+1] AS w2, count(*) AS n
        |FROM w, unnest(range(1, len(ws))) AS t(i)
        |GROUP BY w1, w2 ORDER BY w1, w2""".stripMargin) { (s, dir) =>
      Tables.spread(s, dir, "documents")
        .select(split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        // Spark arrays are 0-indexed (DuckDB's are 1-based): pairs
        // (ws[i], ws[i+1]) for i in 0..size-2
        .select(explode(expr(
          "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"))
          .as("p"))
        .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("w1"), col("w2"))
    },

    // ------------------------------------------------------------------
    // q220: collocation mining — rank adjacent bigrams by LIFT,
    // c_xy·N / (c_x·c_y) (observed co-occurrence over the independence
    // expectation; PMI without the log — ln's libm rounding is not
    // pinned across engines, and exp is monotone so the RANKING is
    // PMI's exactly). q106 counts bigrams; this is the step a tokenizer
    // or phrase-vocabulary builder runs on top: a bigram that is merely
    // frequent ("of the") scores ~1, a bigram that is GLUED (its parts
    // rarely appear apart) scores high — those are the merge/phrase
    // candidates. min-count 5 kills the hapax noise floor (a 1-of-1
    // pair has lift ≈ N). The lift is ONE fixed-shape double expression
    // (the q112 doctrine: identical textual formula, only *,/ —
    // hash-exact); ties at the top-k boundary break on (w1, w2), a
    // total order. Scale: unigram + bigram counts are vocab- and
    // vocab²-bounded grouped aggregates with map-side partials, the
    // scoring join is vocab-sized on both dims, N is a 1-row broadcast,
    // and the top-30 is TakeOrderedAndProject — no global sort
    // materializes.
    QuerySpec.sqlBacked("q220_collocations",
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |uni AS (SELECT unnest(ws) AS u FROM w),
        |ug AS (SELECT u, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY u),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uni),
        |bg AS (SELECT ws[i] AS w1, ws[i+1] AS w2,
        |         CAST(count(*) AS BIGINT) AS c_xy
        |       FROM w, unnest(range(1, len(ws))) AS t(i)
        |       WHERE len(ws) >= 2 GROUP BY w1, w2),
        |sc AS (SELECT bg.w1, bg.w2, bg.c_xy,
        |         CAST(bg.c_xy AS DOUBLE) * CAST(n AS DOUBLE)
        |           / (CAST(ux.c AS DOUBLE) * CAST(uy.c AS DOUBLE)) AS lift
        |       FROM bg JOIN ug ux ON bg.w1 = ux.u
        |               JOIN ug uy ON bg.w2 = uy.u, tot
        |       WHERE bg.c_xy >= 5)
        |SELECT w1, w2, c_xy, lift FROM sc
        |ORDER BY lift DESC, w1, w2 LIMIT 30""".stripMargin) { (s, dir) =>
      val w = Tables.spread(s, dir, "documents")
        .select(split(col("text"), " ").as("ws"))
      val uni = w.select(explode(col("ws")).as("u"))
      val ug = uni.groupBy(col("u")).agg(count(lit(1)).as("c"))
      val tot = uni.agg(count(lit(1)).as("n"))
      w.filter(size(col("ws")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"))
          .as("p"))
        .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(count(lit(1)).as("c_xy"))
        .filter(col("c_xy") >= 5)
        .join(ug.select(col("u").as("w1"), col("c").as("cx")), "w1")
        .join(ug.select(col("u").as("w2"), col("c").as("cy")), "w2")
        .crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"), col("c_xy"),
          expr("""CAST(c_xy AS DOUBLE) * CAST(n AS DOUBLE)
            | / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))"""
            .stripMargin.replace("\n", "")).as("lift"))
        .orderBy(col("lift").desc, col("w1"), col("w2"))
        .limit(30)
    },

    // ------------------------------------------------------------------
    // q222: cross-source quantile NORMALIZATION of the quality score —
    // the step before mixing heterogeneously-scored sources (q79/q99's
    // upstream): a raw score of x from a lenient source is not the same
    // evidence as x from a strict one, so each doc's score maps to the
    // POOLED distribution's value at the doc's within-source percentile
    // (classic quantile normalization, Bolstad 2003). All-integer rank
    // arithmetic in ppm (the q105 micro-unit doctrine): within-source
    // percentile = 1e6·srk div (n_s−1), matched pooled rank =
    // pct·(N−1) div 1e6 — the two-step quantization keeps every product
    // under 2^63 up to ~9e12 docs (srk·1e6, then ppm·N). Scale: BOTH
    // rank assignments are GlobalIndex distributed sorts (the q73/q121
    // operator — per-source ranks come from rank-in-(source,si) order
    // minus a per-source offset, so no per-source single-task window
    // exists); the offset/count frames are |sources| rows (the one tiny
    // window, dimension-bounded), the pooled lookup is one integer
    // equi-join. Every step exact → even the normalized scores
    // hash-match.
    QuerySpec.sqlBacked("q222_source_quantile_norm",
      s"""WITH d AS (SELECT doc_id, source,
         |    CAST($classifierScoreSql AS BIGINT) AS si
         |  FROM (SELECT doc_id, source, text FROM documents)),
         |g AS (SELECT doc_id, source, si,
         |    CAST(row_number() OVER (ORDER BY si, doc_id) - 1 AS BIGINT)
         |      AS grk,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY si, doc_id) - 1 AS BIGINT) AS srk,
         |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_s,
         |    CAST(count(*) OVER () AS BIGINT) AS n
         |  FROM d),
         |p AS (SELECT doc_id, source, si,
         |    (1000000 * srk) // greatest(n_s - 1, CAST(1 AS BIGINT))
         |      AS pct_ppm,
         |    ((1000000 * srk) // greatest(n_s - 1, CAST(1 AS BIGINT))
         |      * (n - 1)) // 1000000 AS tgt
         |  FROM g)
         |SELECT p.doc_id, p.source, p.si, p.pct_ppm, g2.si AS norm_si
         |FROM p JOIN g g2 ON g2.grk = p.tgt
         |ORDER BY p.doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.spread(s, dir, "documents")
        .select(col("doc_id"), col("source"), classifierScore.as("si"))
      Dedup.withScratch(d) {
        val pooled = graft.operators.GlobalIndex
          .assign(d, Seq(col("si"), col("doc_id")), "grk")
        val bySrc = graft.operators.GlobalIndex
          .assign(d, Seq(col("source"), col("si"), col("doc_id")), "rk2")
        // per-source sizes + running offsets: |sources| rows — the one
        // place a bare window is allowed (dimension-bounded by design)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("source"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)
        val offs = d.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
          .withColumn("off", coalesce(sum(col("n_s")).over(w), lit(0L)))
        val tot = d.agg(count(lit(1)).as("n"))
        bySrc.join(broadcast(offs), "source")
          .crossJoin(broadcast(tot))
          .select(col("doc_id"), col("source"), col("si"),
            expr("""(1000000 * (rk2 - off))
              | div greatest(n_s - 1, CAST(1 AS BIGINT))"""
              .stripMargin.replace("\n", "")).as("pct_ppm"),
            col("n"))
          .select(col("doc_id"), col("source"), col("si"), col("pct_ppm"),
            expr("(pct_ppm * (n - 1)) div 1000000").as("tgt"))
          .join(pooled.select(col("grk").as("tgt"), col("si").as("norm_si")),
            "tgt")
          .select(col("doc_id"), col("source"), col("si"), col("pct_ppm"),
            col("norm_si"))
          .orderBy(col("doc_id"))
      }
    },

    // ------------------------------------------------------------------
    // q226: held-out LM evaluation — next-token accuracy of the q180
    // Kneser-Ney bigram model, completing the LM family's train/eval
    // discipline: the model trains on the TRAIN split only (the q218
    // md5-nibble convention, nib ≤ 12) and is graded on the TEST
    // split's bigram events (nib ≥ 14). The prediction is the argmax
    // continuation per history word — and because KN's denominator
    // 4·cw1·B depends only on w1, the argmax is over the exact INTEGER
    // numerator kn_num (ties toward the smaller w2, a pinned total
    // order): no float ever enters, so prediction, event counts and the
    // ppm accuracy all hash-match. Prediction is over the model's
    // OBSERVED continuations (the decoding-over-support convention —
    // ranking unseen w2 by backoff mass alone would be a vocab×history
    // cross product for a prediction no decoder makes). Scale: the
    // model is the vocab²-bounded kn table, the argmax ONE
    // map-side-combining min(struct) per w1, the grading a test-bigram
    // join against the vocab-sized prediction table.
    QuerySpec.sqlBacked("q226_lm_next_token",
      s"""WITH d AS (SELECT text,
         |    strpos('0123456789abcdef',
         |      substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS nib
         |  FROM documents),
         |${knCtesSql("(SELECT text FROM d WHERE nib <= 12)")},
         |pred AS (SELECT w1, w2 AS pred FROM (
         |    SELECT w1, w2, row_number() OVER (PARTITION BY w1
         |      ORDER BY kn_num DESC, w2) AS rn FROM kn) WHERE rn = 1),
         |wt AS (SELECT string_split(text, ' ') AS ws
         |       FROM d WHERE nib >= 14
         |         AND len(string_split(text, ' ')) >= 2),
         |tb AS (SELECT ws[i] AS w1, ws[i+1] AS w2,
         |         CAST(count(*) AS BIGINT) AS c
         |       FROM wt, unnest(range(1, len(ws))) AS t(i) GROUP BY w1, w2)
         |SELECT w1, n_events, n_correct,
         |  (1000000 * n_correct) // n_events AS acc_ppm
         |FROM (
         |  SELECT tb.w1, CAST(sum(c) AS BIGINT) AS n_events,
         |    CAST(sum(CASE WHEN tb.w2 = pred THEN c ELSE 0 END) AS BIGINT)
         |      AS n_correct
         |  FROM tb JOIN pred USING (w1) GROUP BY tb.w1)
         |ORDER BY w1""".stripMargin) { (s, dir) =>
      val docs = Tables.spread(s, dir, "documents")
        .select(col("text"),
          (instr(lit("0123456789abcdef"),
            substring(md5(col("doc_id").cast("string")), 1, 1)) - 1)
            .as("nib"))
      def bigrams(d: org.apache.spark.sql.DataFrame) = d
        .select(split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"))
          .as("p"))
        .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(count(lit(1)).as("c"))
      val trainBi = bigrams(docs.filter(col("nib") <= 12))
      // argmax continuation by (kn_num DESC, w2 ASC) via min(struct):
      // one combining aggregate over the vocab²-bounded model, no window
      val pred = Dedup.withScratch(trainBi)(knFromCounts(trainBi, minC = 1L))
        .groupBy(col("w1"))
        .agg(min(struct((-col("kn_num")).as("nk"), col("w2").as("p")))
          .as("m"))
        .select(col("w1"), col("m.p").as("pred"))
      bigrams(docs.filter(col("nib") >= 14))
        .join(pred, "w1")
        .groupBy(col("w1"))
        .agg(sum(col("c")).as("n_events"),
          sum(when(col("w2") === col("pred"), col("c")).otherwise(0L))
            .as("n_correct"))
        .select(col("w1"), col("n_events"), col("n_correct"),
          expr("(1000000 * n_correct) div n_events").as("acc_ppm"))
        .orderBy(col("w1"))
    },

    // ------------------------------------------------------------------
    // BM25 relevance (log-free variant): top-20 docs for a fixed 3-term
    // query — the retrieval scorer a RAG/curation pipeline runs to rank
    // corpus documents against a probe query. idf is the raw Robertson
    // ratio (N-df+0.5)/(df+0.5) WITHOUT the log: ln's libm rounding is
    // not pinned across engines (the q99-sqrt-vs-pow doctrine). The
    // ratio is rank-equivalent PER TERM (monotone in df); the emitted
    // score SUMS three per-term scores, and a monotone transform does
    // not commute with a sum, so the multi-term ranking is a deliberate
    // log-free VARIANT of BM25 (high-df terms weigh relatively more),
    // not a faithful reproduction. Every remaining operation (one
    // division, correctly-rounded multiplies/adds in a FIXED left-to-
    // right order, identical textual formula on both sides) is IEEE-
    // identical — so even the double scores hash-match. Scale: tf/dl
    // are per-row projections, the corpus stats ONE global aggregate
    // broadcast back, scoring a projection, and the only real shuffle
    // is the final top-k sort of score-carrying ids.
    QuerySpec.sqlBacked("q112_bm25", {
      val terms = Seq("dup", "join", "window")
      def tfSql(i: Int) =
        s"CAST(len(list_filter(ws, x -> x = '${terms(i)}')) AS BIGINT) AS tf$i"
      def scoreSql(i: Int) =
        s"""((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5)
           | / (CAST(df$i AS DOUBLE) + 0.5))
           | * (CAST(tf$i AS DOUBLE) * 2.2)
           | / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75
           |    * (CAST(dl AS DOUBLE) * CAST(n AS DOUBLE) / CAST(sdl AS DOUBLE))))"""
          .stripMargin.replace("\n", "")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
         |           FROM documents),
         |st AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
         |         ${tfSql(0)}, ${tfSql(1)}, ${tfSql(2)}
         |       FROM w),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(dl) AS BIGINT) AS sdl,
         |        CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
         |        CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
         |        CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
         |      FROM st)
         |SELECT doc_id, tf0, tf1, tf2, dl, score, rnk FROM (
         |  SELECT doc_id, tf0, tf1, tf2, dl, score,
         |    row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
         |  FROM (SELECT doc_id, tf0, tf1, tf2, dl,
         |          (${scoreSql(0)}) + (${scoreSql(1)}) + (${scoreSql(2)}) AS score
         |        FROM st, g))
         |WHERE rnk <= 20 ORDER BY rnk""".stripMargin
    }) { (s, dir) =>
      val terms = Seq("dup", "join", "window")
      def tfExpr(i: Int) =
        expr(s"CAST(size(filter(ws, x -> x = '${terms(i)}')) AS BIGINT)")
          .as(s"tf$i")
      // the SAME textual arithmetic as the oracle: correctly-rounded op
      // by op, left to right — bit-identical double scores
      def scoreExpr(i: Int) =
        s"""((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5)
           | / (CAST(df$i AS DOUBLE) + 0.5))
           | * (CAST(tf$i AS DOUBLE) * 2.2)
           | / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75
           |    * (CAST(dl AS DOUBLE) * CAST(n AS DOUBLE) / CAST(sdl AS DOUBLE))))"""
          .stripMargin.replace("\n", "")
      val st = Tables.spread(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
          tfExpr(0), tfExpr(1), tfExpr(2))
      // st feeds both the stats aggregate and the scoring pass: scratch-
      // cache the narrow (doc_id, dl, tf*) frame so the corpus is
      // scanned and tokenized ONCE (the withScratch contract)
      Dedup.withScratch(st) {
        def dfCol(i: Int) =
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")
        val g = st.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"),
          dfCol(0), dfCol(1), dfCol(2))
        // top-k via sort+limit = TakeOrderedAndProject (per-partition
        // heads merged on one reducer), never a global single-task
        // row_number sort; the rank window then runs over 20 rows only
        val top = st.crossJoin(broadcast(g))
          .select(col("doc_id"), col("tf0"), col("tf1"), col("tf2"), col("dl"),
            (expr(scoreExpr(0)) + expr(scoreExpr(1)) + expr(scoreExpr(2)))
              .as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))
        top.withColumn("rnk", row_number().over(w))
          .select(col("doc_id"), col("tf0"), col("tf1"), col("tf2"),
            col("dl"), col("score"), col("rnk"))
          .orderBy(col("rnk"))
      }
    },

    // ------------------------------------------------------------------
    // q132: index-accelerated phrase search — the inverted-index lookup a
    // corpus-search / decontamination tool runs for a literal word
    // phrase, next to q69 (repeated passages) and q63 (known-benchmark
    // lookup). Semantics: word-aligned occurrence, i.e. the phrase
    // bounded by token boundaries (padded `contains` on ' phrase ').
    // Index path: posting lists of word BIGRAMS (WordShingles k=2, the
    // dedup family's shared gram machinery); a phrase occurrence implies
    // every one of its bigrams occurs word-aligned, so docs holding ALL
    // query bigrams are a provably lossless candidate set — the padded
    // `contains` verify on that sliver restores exactness (adjacency is
    // what the index cannot see). The oracle is the full-scan `contains`,
    // so the gate proves index path ≡ brute force. Scale shape: the
    // query-gram filter is a literal IN pushed inside the shingle scan
    // (non-matching grams never leave the exploding projection), the
    // posting shuffle carries (gram, doc_id) for ~df rows per query
    // gram, the candidate set after the ALL-grams intersection is tiny
    // and broadcast back against the corpus for the verify fetch. With a
    // MATERIALIZED posting table (the 100 TB deployment) the first scan
    // disappears entirely; the shape here pays it once per query.
    QuerySpec.sqlBacked("q132_phrase_search", {
      val phrase = "table window table"
      s"""SELECT doc_id, source, n_chars
         |FROM documents
         |WHERE contains(' ' || text || ' ', ' $phrase ')
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val phrase = "table window table"
      val words = phrase.split(" ").toSeq
      val grams = words.sliding(2).map(_.mkString(" ")).toSeq.distinct
      val docs = Tables.spread(s, dir, "documents")
      val postings = docs
        .select(col("doc_id"),
          explode(graft.plans.WordShingles(col("text"), 2, distinct = true))
            .as("gram"))
        .filter(col("gram").isin(grams: _*))
      val candidates = postings
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("ng"))
        .filter(col("ng") === grams.size)
      docs.join(broadcast(candidates), "doc_id")
        // deliberate anti-pushdown: the leading pad char derives from the
        // CANDIDATE side (ng == #grams holds for every candidate, so the
        // value is always ' '), which makes the predicate reference both
        // join sides — without this, Catalyst pushes the contains below
        // the join and verify-scans the ENTIRE corpus, which is exactly
        // the full-text pass the index exists to avoid (caught in the
        // PLANS.md audit: Filter(3) sat under the join, 12 rows out of
        // the raw scan).
        .filter(concat(
          when(col("ng") === grams.size, lit(" ")).otherwise(lit("-")),
          col("text"), lit(" ")).contains(s" $phrase "))
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // q130: BPE tokenizer training — the first 4 merge rounds of
    // byte-pair encoding over the corpus vocabulary, the step that sits
    // upstream of every token-count/fertility statistic (q33/q96). The
    // distributed shape is the one that matters at 100 TB: the corpus is
    // scanned ONCE, reduced to the word histogram (vocab-bounded,
    // map-side partials — the q96/q106 tokenizer-stats contract), and
    // every merge round then runs on the HISTOGRAM only: pair counts are
    // a vocab-sized aggregate, the argmax pair is ONE broadcast row, and
    // applying the merge is a projection. Lineage is cut per round
    // (localCheckpoint, the KMeans/CC doctrine).
    //
    // Determinism doctrine: ties in pair counts are broken by the total
    // order (count DESC, lhs ASC, rhs ASC) via min(struct(-c, lhs,
    // rhs)); the merge application is a left fold over the symbol list
    // with the IDENTICAL textual CASE in both engines (list_reduce's
    // seed-with-first-element contract mirrored by aggregate over
    // slice(…, 2, n-1)), so the greedy leftmost-non-overlapping merge —
    // including the "a a a" overlap case and multi-char symbol
    // boundaries, which naive string replace gets wrong — is the same
    // map everywhere. Emits (round, lhs, rhs, pair_count).
    QuerySpec.sqlBacked("q130_bpe_merges",
      s"""WITH ${bpeCtesSql(BpeRounds)}
         |SELECT * FROM (
         |${(1 to BpeRounds).map(r =>
            if (r == 1) s"  SELECT CAST(1 AS BIGINT) AS round, lhs, rhs, c FROM b1"
            else s"  SELECT $r, lhs, rhs, c FROM b$r")
           .mkString(" UNION ALL\n")})
         |ORDER BY round""".stripMargin) { (s, dir) =>
      val (merges, _) = bpeTrain(s, dir, BpeRounds)
      merges.reduce(_ union _)
        .select(col("round"), col("lhs"), col("rhs"), col("c"))
        .orderBy(col("round"))
    },

    // ------------------------------------------------------------------
    // q149: BPE tokenizer APPLICATION — encode the corpus with q130's
    // learned merges, the other half of the tokenizer lifecycle (train
    // on the histogram, then tokenize everything). The 100 TB shape is
    // the same economy that makes q130 scale: every DISTINCT word is
    // encoded ONCE on the vocab-bounded histogram (the merge fold never
    // touches the corpus), and the per-document piece count is then a
    // corpus scan joined to the (word → piece count) table — the join
    // carries two integers per distinct word, never the merged symbol
    // strings. Emits per doc: words, pieces, and the pieces/word
    // fertility the q96 report aggregates by language — here at DOCUMENT
    // grain, the pre-packing statistic q71's sequence packer consumes.
    QuerySpec.sqlBacked("q149_bpe_encode", bpeEncodeOracleSql) { (s, dir) =>
      val (_, vocab) = bpeTrain(s, dir, BpeRounds)
      bpeEncodeWith(s, dir, vocab)
    },

    // ------------------------------------------------------------------
    // q189: BPE encoding from a PERSISTED tokenizer — the q187/q188
    // persisted-index move applied to the TOKENIZER family: q149 trains
    // the merge table inside every execution, but a production pipeline
    // trains a tokenizer ONCE and encodes every corpus shard against the
    // frozen vocabulary (exactly how GPT-style pipelines ship
    // tokenizer.json). The build ([[bpeVocabIndex]], once per JVM per
    // corpus dir) persists q130's trained vocabulary (word -> space-
    // separated piece repr — vocab-bounded, the broadcastable model
    // contract); the serve path is ONE corpus explode joined against
    // the vocab SCAN, pinned by a scannedPaths require. Shares
    // [[bpeEncodeOracleSql]] verbatim with q149 — the driver hash
    // proves the split changed the plan, not the result. At 100 TB:
    // encode cost is the corpus scan + a broadcast-sized join; training
    // amortizes to zero across shards.
    QuerySpec.sqlBacked("q189_bpe_encode_serve", bpeEncodeOracleSql) {
      (s, dir) =>
      val idx = bpeVocabIndex(s, dir)
      val vocab = s.read.parquet(s"$idx/bpe_vocab.parquet")
      val served = bpeEncodeWith(s, dir, vocab)
      val scans = graft.plans.SummaryRewrite.scannedPaths(served)
      require(scans.exists(_.endsWith("bpe_vocab.parquet")),
        s"q189: serve path does not read the persisted vocab (scans: $scans)")
      served
    },

    // ------------------------------------------------------------------
    // q150: intra-document repetition profile — the Gopher/C4
    // "repetitious document" quality rules (top-n-gram mass fraction,
    // duplicated-n-gram mass fraction over word 3-grams), the standard
    // pre-training filter the per-doc quality score (q32) does not see
    // because it never looks at gram multiplicity. The whole statistic
    // is per-document, so the native plans.RepetitionStats expression
    // computes all four counts in ONE hash-map pass inside the
    // projection: at 100 TB this is a corpus scan with ZERO shuffle,
    // versus the oracle's explode → (doc, gram) count → re-aggregate
    // shape (a corpus-sized exchange). Counts are exact integers;
    // ratios are single double divisions; the filter decision
    // cross-multiplies (dup_occ*5 >= n_grams, i.e. >= 20% duplicated
    // gram mass) so no double ever decides a row — the q88 doctrine.
    // Docs with fewer than 3 words have no grams and drop on both sides.
    QuerySpec.sqlBacked("q150_doc_repetition",
      """WITH g AS (
        |  SELECT doc_id, ss[i] || ' ' || ss[i+1] || ' ' || ss[i+2] AS gram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ss FROM documents),
        |       unnest(range(1, len(ss) - 1)) AS t(i)
        |),
        |c AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_grams,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(max(c) AS BIGINT) AS top_count,
        |  CAST(COALESCE(sum(c) FILTER (WHERE c > 1), 0) AS BIGINT) AS dup_occ,
        |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_frac,
        |  CAST(COALESCE(sum(c) FILTER (WHERE c > 1), 0) AS DOUBLE)
        |    / CAST(sum(c) AS DOUBLE) AS dup_frac,
        |  COALESCE(sum(c) FILTER (WHERE c > 1), 0) * 5 >= sum(c)
        |    AS is_repetitive
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.spread(s, dir, "documents")
        .select(col("doc_id"),
          graft.plans.RepetitionStats(col("text"), 3).as("r"))
        .select(col("doc_id"), col("r.n_grams").as("n_grams"),
          col("r.n_distinct").as("n_distinct"),
          col("r.top_count").as("top_count"), col("r.dup_occ").as("dup_occ"))
        .filter(col("n_grams") > 0)
        .select(col("doc_id"), col("n_grams"), col("n_distinct"),
          col("top_count"), col("dup_occ"),
          (col("top_count").cast("double") / col("n_grams").cast("double"))
            .as("top_frac"),
          (col("dup_occ").cast("double") / col("n_grams").cast("double"))
            .as("dup_frac"),
          (col("dup_occ") * 5 >= col("n_grams")).as("is_repetitive"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // q180: interpolated Kneser–Ney bigram probabilities — the smoothed
    // LM estimate a quality-filtering pipeline scores text against
    // (CCNet-style perplexity proxies start exactly here), and the step
    // AFTER q106's raw counts / q130's BPE merges in tokenizer-and-LM
    // prep. With discount D = 3/4,
    //   P_KN(w2|w1) = (c−D)/c(w1•) + D·N1+(w1,•)/c(w1•) · N1+(•,w2)/B
    // over observed bigrams — every term a count ratio, so multiplying
    // through by 4·c(w1•)·B gives the EXACT rational
    //   kn_num/kn_den = ((4c−3)·B + 3·N1+(w1,•)·N1+(•,w2)) / (4·c(w1•)·B)
    // in pure BIGINT arithmetic: no libm, no float rounding, the hash
    // gate compares the probability itself (the q99/q112 doctrine taken
    // all the way — not even a final double division). Scale: the
    // explode collapses to ≤ vocab² keys under map-side partials
    // (q106's wire argument); the three stat frames are vocab-bounded
    // dimensions joined back onto the bigram table; B is a ONE-ROW
    // broadcast. Nothing corpus-sized crosses an exchange after the
    // first aggregate. The divide-compare guard fails loudly where
    // (4c−3)·B would leave Long — at that B, widen to DECIMAL — rather
    // than silently wrapping where DuckDB would error (q172 doctrine).
    QuerySpec.sqlBacked("q180_kneser_ney",
      s"""WITH $knCtesSql
         |SELECT w1, w2, c, cw1, n1w1, ncont, kn_num, kn_den
         |FROM kn WHERE c >= 5 ORDER BY w1, w2""".stripMargin) { (s, dir) =>
      knScores(s, dir, minC = 5L)
        .orderBy(col("w1"), col("w2"))
    },

    // ------------------------------------------------------------------
    // q183: bigram-fluency filter — the model-based quality gate q180's
    // LM exists to power: score every document by how many of its
    // adjacent bigrams fall below a probability floor (P_KN < 1/1000),
    // flag docs where ≥ 20% do. This is the perplexity-filter shape
    // (CCNet et al.) with the log-space score replaced by an exact
    // threshold COUNT, so the decision is pure integer: P < 1/1000 on
    // the rational kn_num/kn_den is kn_num ≤ ceil(kn_den/1000) − 1 —
    // cross-multiplication without the ×1000 that could leave Long near
    // the guard boundary — and the flag cross-multiplies 5·n_low ≥ n
    // (the q150 rule). An UNSEEN bigram (NULL after the left join —
    // impossible self-scored, the held-out case) counts low by
    // definition. Scale: doc pairs re-join the model on (w1, w2) —
    // the model side is vocab²-bounded (broadcast here; bucketed join
    // once vocab² outgrows it), and broadcasting the model is also what
    // neutralizes the Zipf skew of stopword pairs, which would make any
    // shuffled join's hottest key arbitrarily hot. One aggregate keyed
    // by doc_id closes it out.
    QuerySpec.sqlBacked("q183_fluency_filter",
      s"""WITH $knCtesSql,
         |p AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |        FROM documents WHERE len(string_split(text, ' ')) >= 2),
         |       unnest(range(1, len(ws))) AS t(i))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(CASE WHEN kn_num IS NULL
         |      OR kn_num <= (kn_den + 999) // 1000 - 1
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
         |  5 * sum(CASE WHEN kn_num IS NULL
         |      OR kn_num <= (kn_den + 999) // 1000 - 1
         |    THEN 1 ELSE 0 END) >= count(*) AS is_disfluent
         |FROM p LEFT JOIN kn USING (w1, w2)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val pairs = Tables.spread(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"))
          .as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      val model = knScores(s, dir)
        .select(col("w1"), col("w2"), col("kn_num"), col("kn_den"))
      val low = col("kn_num").isNull ||
        col("kn_num") <= expr("(kn_den + 999) div 1000") - 1
      // model is the distinct-bigram table — vocab²-bounded, i.e. it
      // GROWS with the corpus, so it must not be pinned as a broadcast
      // (AQE broadcasts it on its own while it is actually small); the
      // join shuffles both sides on (w1, w2) at scale
      pairs.join(model, Seq("w1", "w2"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(low, 1L).otherwise(0L)).as("n_low"))
        .select(col("doc_id"), col("n_bigrams"), col("n_low"),
          (col("n_low") * 5 >= col("n_bigrams")).as("is_disfluent"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // q184: per-source bigram divergence — total-variation distance
    // between each source's bigram distribution and the whole corpus:
    // the inter-domain similarity signal that tells q182's mixture
    // planner WHICH sources are redundant with the mix and which add
    // coverage (DoReMi-style reweighting starts from exactly this
    // matrix). Exact integers end-to-end (the q128 TV doctrine — no
    // KL/PSI, whose libm logs diverge across engines): over the
    // source's own bigrams, |c_s·n − c·n_s|; the corpus mass the source
    // NEVER emits contributes (n − cov_s)·n_s in one closed term, so no
    // outer join against the full vocabulary is ever materialized.
    // tv = tv_num / (2·n_s·n), division last. Shape: ONE corpus scan
    // builds the (source, w1, w2) counts; the corpus marginal re-
    // aggregates THAT (vocab²-bounded, broadcast back); the per-source
    // close-out is a |sources|-row aggregate. Guard: n_s·n must stay in
    // Long — at 100 TB token counts the products leave BIGINT and the
    // query must raise (widen to DECIMAL), never wrap (q172 doctrine).
    QuerySpec.sqlBacked("q184_source_divergence",
      """WITH w AS (SELECT source, string_split(text, ' ') AS ws
        |           FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |sb AS (SELECT source, ws[i] AS w1, ws[i+1] AS w2,
        |         CAST(count(*) AS BIGINT) AS cs
        |       FROM w, unnest(range(1, len(ws))) AS t(i)
        |       GROUP BY source, w1, w2),
        |cb AS (SELECT w1, w2, CAST(sum(cs) AS BIGINT) AS c
        |       FROM sb GROUP BY w1, w2),
        |ns AS (SELECT source, CAST(sum(cs) AS BIGINT) AS n_s
        |       FROM sb GROUP BY source),
        |tot AS (SELECT CAST(sum(cs) AS BIGINT) AS n FROM sb)
        |SELECT sb.source AS source, n_s,
        |  CAST(sum(abs(cs * n - c * n_s))
        |    + (n - sum(c)) * n_s AS BIGINT) AS tv_num,
        |  CAST(2 * n_s * n AS BIGINT) AS tv_den,
        |  CAST(CAST(sum(abs(cs * n - c * n_s))
        |      + (n - sum(c)) * n_s AS BIGINT) AS DOUBLE)
        |    / CAST(2 * n_s * n AS DOUBLE) AS tv
        |FROM sb JOIN cb USING (w1, w2) JOIN ns ON sb.source = ns.source,
        |     tot
        |GROUP BY sb.source, n_s, n ORDER BY source""".stripMargin) {
      (s, dir) =>
      val sb = Tables.spread(s, dir, "documents")
        .select(col("source"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("source"), explode(expr(
          "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"))
          .as("p"))
        .groupBy(col("source"), col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(count(lit(1)).as("cs"))
      val cb = sb.groupBy(col("w1"), col("w2")).agg(sum(col("cs")).as("c"))
      val ns = sb.groupBy(col("source")).agg(sum(col("cs")).as("n_s"))
      val tot = sb.agg(sum(col("cs")).as("n"))
      // cb is corpus-wide distinct-bigram counts — grows with vocab², so
      // no pinned broadcast (AQE handles the small case); ns is
      // source-count-bounded and stays an explicit broadcast
      sb.join(cb, Seq("w1", "w2"))
        .join(broadcast(ns), "source")
        .crossJoin(broadcast(tot))
        // divide-compare guard BEFORE any product (c·n_s ≤ n·n_s is the
        // largest factor pair; tv_den doubles it)
        .withColumn("n", when(
          col("n_s") > expr("4500000000000000000L div n"),
          expr("raise_error('graft q184: n_s * n exceeds BIGINT " +
            "headroom - widen to DECIMAL')").cast("long"))
          .otherwise(col("n")))
        .groupBy(col("source"), col("n_s"), col("n"))
        .agg(sum(abs(col("cs") * col("n") - col("c") * col("n_s")))
          .as("present_num"), sum(col("c")).as("cov"))
        .select(col("source"), col("n_s"),
          (col("present_num") + (col("n") - col("cov")) * col("n_s"))
            .as("tv_num"),
          (col("n_s") * col("n") * 2).as("tv_den"),
          ((col("present_num") + (col("n") - col("cov")) * col("n_s"))
            .cast("double") / (col("n_s") * col("n") * 2).cast("double"))
            .as("tv"))
        .orderBy(col("source"))
    },

    // ------------------------------------------------------------------
    // q197: model-based quality gate — a hashed linear text classifier
    // (the fastText-style third quality signal beside q32's heuristics
    // and q183's LM fluency): every token hashes to a fixed weight
    // w(tok) = md5-16-bit - 32768 in [-32768, 32767], a document's score
    // is the exact integer SUM of its token weights (feature hashing,
    // Weinberger '09 — no vocabulary table, no training state to ship),
    // and the gate keeps docs with score >= 0. Report per (source,
    // lang): docs, kept, exact sum of scores and tokens, and the mean
    // per-token weight as ONE double division of exact integers (the
    // q99/q173 convention). In production the md5-derived weights are
    // replaced by a learned weight table; the plan is identical. Scale:
    // score and gate are per-row codegen'd fold projections inside the
    // scan — ZERO shuffle before the |sources × langs|-row aggregate
    // with map-side partials.
    QuerySpec.sqlBacked("q197_quality_classifier",
      s"""SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN si >= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(sum(si) AS BIGINT) AS sum_score,
        |  CAST(sum(nt) AS BIGINT) AS sum_tok,
        |  CAST(CAST(sum(si) AS BIGINT) AS DOUBLE)
        |    / CAST(sum(nt) AS BIGINT) AS mean_w
        |FROM (SELECT source, lang,
        |    $classifierScoreSql AS si,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |  FROM documents)
        |GROUP BY source, lang ORDER BY source, lang""".stripMargin) {
      (s, dir) =>
      Tables.spread(s, dir, "documents")
        .select(col("source"), col("lang"), classifierScore.as("si"),
          size(split(col("text"), " ")).cast("long").as("nt"))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("si") >= 0, 1L).otherwise(0L)).as("n_kept"),
          sum(col("si")).as("sum_score"),
          sum(col("nt")).as("sum_tok"))
        .select(col("source"), col("lang"), col("n_docs"), col("n_kept"),
          col("sum_score"), col("sum_tok"),
          (col("sum_score").cast("double") / col("sum_tok"))
            .as("mean_w"))
        .orderBy(col("source"), col("lang"))
    },

    // ------------------------------------------------------------------
    // q204: classifier calibration report — the agreement audit between
    // two INDEPENDENT quality signals before either gates a 100 TB
    // corpus: q197's hashed-feature score is cut into global equi-depth
    // deciles, and each decile reports the pass rate of q32's stopword
    // heuristic (here as the exact integer test 10·n_stop >= n_tok).
    // The reliability-diagram shape: a score worth gating on shows a
    // heuristic-pass rate that moves monotonically across deciles; a
    // flat profile says the two signals are measuring different things
    // (md5 weights are deliberately uncorrelated — the REPORT is the
    // operator, the weights are the placeholder). Scale: the decile cut
    // is the q127 machinery — GlobalIndex's range-exchange ordinal +
    // broadcast-count ntile allocation, never a single-partition global
    // window — and the score/heuristic are scan-stage projections
    // sharing q197's fold (ONE definition, both engines).
    QuerySpec.sqlBacked("q204_score_calibration",
      s"""WITH d AS (SELECT doc_id, ' '||text||' ' AS padded,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    $classifierScoreSql AS si
        |  FROM documents),
        |h AS (SELECT doc_id, si,
        |    CASE WHEN ((length(padded)
        |        - length(replace(padded, ' the ', ''))) // 5
        |      + (length(padded)
        |        - length(replace(padded, ' a ', ''))) // 3) * 10
        |      >= n_tok THEN 1 ELSE 0 END AS heur FROM d),
        |r AS (SELECT si, heur,
        |    CAST(ntile(10) OVER (ORDER BY si, doc_id) AS BIGINT)
        |      AS decile FROM h)
        |SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(si) AS BIGINT) AS min_score,
        |  CAST(max(si) AS BIGINT) AS max_score,
        |  CAST(sum(heur) AS BIGINT) AS n_heur,
        |  CAST(1000000 * sum(heur) // count(*) AS BIGINT) AS heur_ppm
        |FROM r GROUP BY decile ORDER BY decile""".stripMargin) {
      (s, dir) =>
      val b = 10
      def occDiv(p: String) =
        s"(length(padded) - length(replace(padded, '$p', ''))) div ${p.length}"
      val d = Tables.spread(s, dir, "documents")
        .withColumn("padded", concat(lit(" "), col("text"), lit(" ")))
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          classifierScore.as("si"),
          expr(s"${occDiv(" the ")} + ${occDiv(" a ")}").as("n_stop"))
        .withColumn("heur",
          when(col("n_stop") * 10 >= col("n_tok"), 1L).otherwise(0L))
        .select(col("doc_id"), col("si"), col("heur"))
      val ranked = graft.operators.GlobalIndex.assign(d,
        Seq(col("si"), col("doc_id")), "rk")
      val cnt = d.agg(count(lit(1)).as("total"))
      ranked.crossJoin(broadcast(cnt))
        // the q127 ntile allocation: rem = total mod b leading bins of
        // size q+1, size q after; rk is 0-based
        .withColumn("decile",
          when(col("rk") < (col("total") % b) * (expr(s"total div $b") + 1),
            expr(s"rk div (total div $b + 1)"))
            .otherwise(col("total") % b +
              expr(s"(rk - (total % $b) * (total div $b + 1)) div (total div $b)"))
            + 1)
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"), min(col("si")).as("min_score"),
          max(col("si")).as("max_score"), sum(col("heur")).as("n_heur"))
        .select(col("decile"), col("n_docs"), col("min_score"),
          col("max_score"), col("n_heur"),
          expr("1000000L * n_heur div n_docs").as("heur_ppm"))
        .orderBy(col("decile"))
    },

    // ------------------------------------------------------------------
    // q212: exact AUC (Mann–Whitney) of the q197 classifier score
    // against q204's stopword heuristic — the one-number ranking-
    // quality eval a filtering pipeline reads before trusting a score
    // as a gate (q204's deciles show WHERE calibration bends; AUC says
    // whether the ordering is right at all). Exact-integer doctrine:
    // ties count half, so everything is doubled once —
    // auc_num2 = Σ_s pos(s)·(2·negBelow(s) + neg(s)), auc_den2 =
    // 2·n_pos·n_neg — and AUC is ONE final double division (q88/q91).
    // Scale: a per-score aggregate (map-side partials; |scores| ≤
    // corpus), ONE PrefixSum range exchange for the cumulative
    // negatives (never a global single-task window), and a 3-long
    // moment row. ANSI multiplication fails loudly if 2·n_pos·n_neg
    // ever leaves BIGINT (n ≳ 4e9 — widen to DECIMAL there).
    QuerySpec.sqlBacked("q212_exact_auc",
      s"""WITH d AS (SELECT doc_id, ' '||text||' ' AS padded,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    $classifierScoreSql AS si
         |  FROM documents),
         |h AS (SELECT si,
         |    CASE WHEN ((length(padded)
         |        - length(replace(padded, ' the ', ''))) // 5
         |      + (length(padded)
         |        - length(replace(padded, ' a ', ''))) // 3) * 10
         |      >= n_tok THEN 1 ELSE 0 END AS heur FROM d),
         |per AS (SELECT si, CAST(count(*) AS BIGINT) AS cnt,
         |          CAST(sum(heur) AS BIGINT) AS pos FROM h GROUP BY si),
         |cum AS (SELECT si, pos, cnt - pos AS neg,
         |    CAST(COALESCE(sum(cnt - pos) OVER (ORDER BY si
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cneg
         |  FROM per),
         |m AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
         |    CAST(sum(cnt - pos) AS BIGINT) AS n_neg,
         |    CAST(sum(pos * (2 * cneg + cnt - pos)) AS BIGINT) AS auc_num2
         |  FROM (SELECT c.si, c.pos, c.cneg, p.cnt
         |        FROM cum c JOIN per p ON p.si = c.si))
         |SELECT n_pos, n_neg, auc_num2,
         |  CAST(2 * n_pos * n_neg AS BIGINT) AS auc_den2,
         |  CAST(auc_num2 AS DOUBLE)
         |    / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
         |FROM m""".stripMargin) { (s, dir) =>
      def occDiv(p: String) =
        s"(length(padded) - length(replace(padded, '$p', ''))) div ${p.length}"
      val d = Tables.spread(s, dir, "documents")
        .withColumn("padded", concat(lit(" "), col("text"), lit(" ")))
        .select(size(split(col("text"), " ")).cast("long").as("n_tok"),
          classifierScore.as("si"),
          expr(s"${occDiv(" the ")} + ${occDiv(" a ")}").as("n_stop"))
        .select(col("si"),
          when(col("n_stop") * 10 >= col("n_tok"), 1L).otherwise(0L)
            .as("heur"))
      val per = d.groupBy(col("si"))
        .agg(count(lit(1)).as("cnt"), sum(col("heur")).as("pos"))
        .withColumn("neg", col("cnt") - col("pos"))
      val cum = graft.operators.PrefixSum
        .inclusive(per, Seq(col("si")), "neg", "cumNeg")
        .withColumn("cneg", col("cumNeg") - col("neg"))
      cum.agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
          sum(col("pos") * (lit(2) * col("cneg") + col("neg")))
            .as("auc_num2"))
        .select(col("n_pos"), col("n_neg"), col("auc_num2"),
          (lit(2L) * col("n_pos") * col("n_neg")).as("auc_den2"),
          (col("auc_num2").cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
            .as("auc"))
    },

    // ------------------------------------------------------------------
    // q227: precision/recall OPERATING CURVE of the q197 classifier —
    // the threshold-selection artifact between q212 (is the ordering
    // right at all) and q204 (where calibration bends): at each exact
    // score QUARTILE (the order statistic at rank q·(n−1) div 4, data-
    // derived so the sweep tracks the distribution instead of guessing
    // literals), gate si ≥ threshold and report confusion counts plus
    // precision/recall/F1 in exact ppm (F1's harmonic mean is the
    // integer (2·P·R) div (P+R) on the ppm values — no float enters
    // anywhere). Scale: the quartile thresholds come from ONE
    // GlobalIndex distributed sort (never a single-task window), the
    // sweep is one ×3 broadcast fan-out (bounded by the threshold
    // count, not the corpus) folded by map-side-combining sums, and
    // the report is 3 rows.
    QuerySpec.sqlBacked("q227_classifier_pr",
      s"""WITH d AS (SELECT doc_id, ' '||text||' ' AS padded,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    CAST($classifierScoreSql AS BIGINT) AS si
         |  FROM documents),
         |h AS (SELECT doc_id, si,
         |    CASE WHEN ((length(padded)
         |        - length(replace(padded, ' the ', ''))) // 5
         |      + (length(padded)
         |        - length(replace(padded, ' a ', ''))) // 3) * 10
         |      >= n_tok THEN 1 ELSE 0 END AS heur FROM d),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(heur) AS BIGINT) AS n_pos FROM h),
         |rk AS (SELECT si,
         |    CAST(row_number() OVER (ORDER BY si, doc_id) - 1 AS BIGINT)
         |      AS rk FROM h),
         |thr AS (SELECT q, si AS thr_si
         |        FROM rk, nn, (SELECT unnest([CAST(1 AS BIGINT),
         |          CAST(2 AS BIGINT), CAST(3 AS BIGINT)]) AS q)
         |        WHERE rk = (q * (n - 1)) // 4),
         |pr AS (SELECT q, thr_si,
         |    CAST(sum(CASE WHEN h.si >= thr_si THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_pred,
         |    CAST(sum(CASE WHEN h.si >= thr_si AND heur = 1
         |      THEN 1 ELSE 0 END) AS BIGINT) AS tp
         |  FROM h, thr GROUP BY q, thr_si),
         |pr2 AS (SELECT q AS quartile, thr_si, n_pred, tp,
         |    (1000000 * tp) // greatest(n_pred, CAST(1 AS BIGINT))
         |      AS precision_ppm,
         |    (1000000 * tp) // greatest(n_pos, CAST(1 AS BIGINT))
         |      AS recall_ppm
         |  FROM pr, nn)
         |SELECT quartile, thr_si, n_pred, tp, precision_ppm, recall_ppm,
         |  (2 * precision_ppm * recall_ppm)
         |    // greatest(precision_ppm + recall_ppm, CAST(1 AS BIGINT))
         |    AS f1_ppm
         |FROM pr2 ORDER BY quartile""".stripMargin) { (s, dir) =>
      val d = scoredDocs(Tables.spread(s, dir, "documents"))
      Dedup.withScratch(d) {
        val tot = d.agg(count(lit(1)).as("n"), sum(col("heur")).as("n_pos"))
        val thr = graft.operators.GlobalIndex
          .assign(d.select(col("si"), col("doc_id")),
            Seq(col("si"), col("doc_id")), "rk")
          .crossJoin(broadcast(tot))
          .filter(col("rk") === expr("(1 * (n - 1)) div 4") ||
            col("rk") === expr("(2 * (n - 1)) div 4") ||
            col("rk") === expr("(3 * (n - 1)) div 4"))
          .select(
            when(col("rk") === expr("(1 * (n - 1)) div 4"), lit(1L))
              .when(col("rk") === expr("(2 * (n - 1)) div 4"), lit(2L))
              .otherwise(lit(3L)).as("q"),
            col("si").as("thr_si"))
        d.crossJoin(broadcast(thr)) // x3 fan-out: |thresholds|-bounded
          .groupBy(col("q"), col("thr_si"))
          .agg(sum(when(col("si") >= col("thr_si"), 1L).otherwise(0L))
            .as("n_pred"),
            sum(when(col("si") >= col("thr_si") && col("heur") === 1L, 1L)
              .otherwise(0L)).as("tp"))
          .crossJoin(broadcast(tot))
          .select(col("q").as("quartile"), col("thr_si"), col("n_pred"),
            col("tp"),
            expr("(1000000 * tp) div greatest(n_pred, CAST(1 AS BIGINT))")
              .as("precision_ppm"),
            expr("(1000000 * tp) div greatest(n_pos, CAST(1 AS BIGINT))")
              .as("recall_ppm"))
          .withColumn("f1_ppm",
            expr("""(2 * precision_ppm * recall_ppm)
              | div greatest(precision_ppm + recall_ppm, CAST(1 AS BIGINT))"""
              .stripMargin.replace("\n", "")))
          .orderBy(col("quartile"))
      }
    },

    // ------------------------------------------------------------------
    // q233: COHEN'S KAPPA of the q31 language-ID classifier against the
    // labeled lang column — chance-corrected agreement, the number that
    // separates "85% accurate" from "85% accurate on a corpus that is
    // 80% English anyway" (q227's precision/recall can't see marginal
    // imbalance; kappa is the standard audit for heuristic labelers and
    // annotator agreement before their labels feed a filter). Exact
    // formulation: with n docs, a = Σ diagonal agreements and
    // pe_num = Σ_l row_l·col_l (the product of the two marginals),
    // kappa = (n·a − pe_num) / (n² − pe_num) — numerator and
    // denominator are exact BIGINTs, and kappa itself is ONE
    // fixed-shape double division (the q212/q219 doctrine: ratios of
    // exact integers hash-match; a ppm integer form was rejected only
    // to keep the doctrine's one-division shape — Spark's `div` and
    // DuckDB's `//` both truncate toward zero on negatives, so a
    // signed ppm form would also have matched; the real integer-div
    // hazard is zero divisors, not signs). Degenerate case n² = pe_num
    // (both raters constant) yields NULL identically in both engines.
    // Scale: the prediction is q31's per-row projection; then two
    // |langs|-bounded grouped counts (map-side combined), a
    // |langs|-row marginal join, and two 1-row broadcasts — no
    // corpus-sized shuffle at all. Integer headroom: n² needs
    // n <= ~3e9 docs per audited corpus; past that widen to DECIMAL
    // (the q88 width rule) or shard the audit by source.
    QuerySpec.sqlBacked("q233_langid_kappa",
      s"""WITH $langPredCteSql,
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END)
         |          AS BIGINT) AS n_agree FROM p),
         |rm AS (SELECT pred AS l, CAST(count(*) AS BIGINT) AS r
         |       FROM p GROUP BY pred),
         |cm AS (SELECT lang AS l, CAST(count(*) AS BIGINT) AS c
         |       FROM p GROUP BY lang),
         |pe AS (SELECT CAST(COALESCE(sum(r * c), 0) AS BIGINT) AS pe_num
         |       FROM rm JOIN cm USING (l))
         |SELECT n, n_agree, pe_num,
         |  CASE WHEN n * n = pe_num THEN NULL
         |       ELSE CAST(n * n_agree - pe_num AS DOUBLE)
         |            / CAST(n * n - pe_num AS DOUBLE) END AS kappa
         |FROM m, pe""".stripMargin) { (s, dir) =>
      val p = langPredictions(Tables.spread(s, dir, "documents"))
        .select(col("lang"), col("pred"))
      Dedup.withScratch(p) {
        val m = p.agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("pred") === col("lang"), 1L).otherwise(0L))
            .as("n_agree"))
        val rm = p.groupBy(col("pred").as("l"))
          .agg(count(lit(1)).cast("long").as("r"))
        val cm = p.groupBy(col("lang").as("l"))
          .agg(count(lit(1)).cast("long").as("c"))
        val pe = rm.join(cm, "l")
          .agg(coalesce(sum(col("r") * col("c")), lit(0L)).as("pe_num"))
        m.crossJoin(broadcast(pe))
          .select(col("n"), col("n_agree"), col("pe_num"),
            when(col("n") * col("n") === col("pe_num"), lit(null))
              .otherwise((col("n") * col("n_agree") - col("pe_num"))
                .cast("double") /
                (col("n") * col("n") - col("pe_num")).cast("double"))
              .as("kappa"))
      }
    },

    // ------------------------------------------------------------------
    // q236: per-class precision/recall/F1 + MACRO-F1 of the q31
    // language-ID labeler — the class-level diagnostic completing the
    // classifier-audit set (q227 sweeps thresholds on ONE binary gate,
    // q233's kappa is one chance-corrected global number; this is the
    // per-class table that shows WHICH language the labeler fails on,
    // and macro-F1 weights every class equally so a rare language's
    // collapse can't hide behind the majority class). Counts come from
    // two |classes|-bounded grouped aggregates (by pred with an
    // agreement sum, by lang) outer-joined over the observed class
    // union — tp directly, fp = n_pred − tp, fn = n_lang − tp — and
    // every ratio is q227's exact ppm integer arithmetic. The macro row
    // is the |classes|-row average (sum div count), appended with NULL
    // counts so the grain stays explicit. Scale: the prediction is a
    // per-row projection; everything after the two grouped counts is
    // |classes|-sized.
    QuerySpec.sqlBacked("q236_langid_macro_f1",
      s"""WITH $langPredCteSql,
         |bp AS (SELECT pred AS cls, CAST(count(*) AS BIGINT) AS np,
         |         CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END)
         |           AS BIGINT) AS tp
         |       FROM p GROUP BY pred),
         |bl AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS nl
         |       FROM p GROUP BY lang),
         |cl AS (SELECT cls FROM bp UNION SELECT cls FROM bl),
         |m AS (SELECT cl.cls,
         |        coalesce(bp.tp, 0) AS tp,
         |        coalesce(bp.np, 0) - coalesce(bp.tp, 0) AS fp,
         |        coalesce(bl.nl, 0) - coalesce(bp.tp, 0) AS fn
         |      FROM cl LEFT JOIN bp ON bp.cls = cl.cls
         |              LEFT JOIN bl ON bl.cls = cl.cls),
         |r AS (SELECT cls, tp, fp, fn,
         |        (1000000 * tp) // greatest(tp + fp, CAST(1 AS BIGINT))
         |          AS precision_ppm,
         |        (1000000 * tp) // greatest(tp + fn, CAST(1 AS BIGINT))
         |          AS recall_ppm
         |      FROM m),
         |f AS (SELECT cls, tp, fp, fn, precision_ppm, recall_ppm,
         |        (2 * precision_ppm * recall_ppm)
         |          // greatest(precision_ppm + recall_ppm, CAST(1 AS BIGINT))
         |          AS f1_ppm
         |      FROM r)
         |SELECT cls, tp, fp, fn, precision_ppm, recall_ppm, f1_ppm FROM f
         |UNION ALL
         |SELECT 'macro', NULL, NULL, NULL,
         |  CAST(sum(precision_ppm) // count(*) AS BIGINT),
         |  CAST(sum(recall_ppm) // count(*) AS BIGINT),
         |  CAST(sum(f1_ppm) // count(*) AS BIGINT)
         |FROM f
         |ORDER BY cls""".stripMargin) { (s, dir) =>
      val p = langPredictions(Tables.spread(s, dir, "documents"))
        .select(col("lang"), col("pred"))
      Dedup.withScratch(p) {
        val bp = p.groupBy(col("pred").as("cls"))
          .agg(count(lit(1)).cast("long").as("np"),
            sum(when(col("pred") === col("lang"), 1L).otherwise(0L)).as("tp"))
        val bl = p.groupBy(col("lang").as("cls"))
          .agg(count(lit(1)).cast("long").as("nl"))
        val cl = bp.select(col("cls")).union(bl.select(col("cls"))).distinct()
        val f = cl
          .join(bp, Seq("cls"), "left")
          .join(bl, Seq("cls"), "left")
          .select(col("cls"),
            coalesce(col("tp"), lit(0L)).as("tp"),
            (coalesce(col("np"), lit(0L)) - coalesce(col("tp"), lit(0L)))
              .as("fp"),
            (coalesce(col("nl"), lit(0L)) - coalesce(col("tp"), lit(0L)))
              .as("fn"))
          .withColumn("precision_ppm",
            expr("(1000000 * tp) div greatest(tp + fp, CAST(1 AS BIGINT))"))
          .withColumn("recall_ppm",
            expr("(1000000 * tp) div greatest(tp + fn, CAST(1 AS BIGINT))"))
          .withColumn("f1_ppm", expr(
            """(2 * precision_ppm * recall_ppm)
              | div greatest(precision_ppm + recall_ppm, CAST(1 AS BIGINT))"""
              .stripMargin.replace("\n", "")))
        Dedup.withScratch(f) {
          val macroRow = f.agg(
            expr("CAST(sum(precision_ppm) div count(*) AS BIGINT)")
              .as("precision_ppm"),
            expr("CAST(sum(recall_ppm) div count(*) AS BIGINT)")
              .as("recall_ppm"),
            expr("CAST(sum(f1_ppm) div count(*) AS BIGINT)").as("f1_ppm"))
            .select(lit("macro").as("cls"),
              lit(null).cast("long").as("tp"),
              lit(null).cast("long").as("fp"),
              lit(null).cast("long").as("fn"),
              col("precision_ppm"), col("recall_ppm"), col("f1_ppm"))
          f.unionByName(macroRow).orderBy(col("cls"))
        }
      }
    },

    // ------------------------------------------------------------------
    // q234: DSIR-style targeted data selection (Xie et al. 2023,
    // arXiv:2302.03169 "Data Selection for Language Models via
    // Importance Resampling"): rank the RAW pool by how much each
    // document's hashed-feature profile looks like a TARGET domain —
    // the step that turns "we have 100 TB of crawl" into "here is the
    // slice that looks like the domain we want more of". Target here =
    // the lang='en' sub-population (a real distributional subgroup:
    // its stopword profile differs from the pool); features = word
    // unigrams hashed to 256 buckets (md5 first byte — DSIR's hashed
    // n-gram model, bucket count bounds the model size). Importance is
    // integer end to end (the q220 LIFT doctrine — no log-likelihood
    // float): per bucket, p_target and p_raw in exact ppm, weight =
    // 1e6·p_t_ppm div max(p_r_ppm, 1) (two-step ppm quantization, the
    // q222 trick that keeps every product under 2^63 at any corpus
    // size); per raw doc, the mean token weight (Σ div n_tok). Top-100
    // by (importance desc, doc_id). Scale: the feature model is a
    // 256-row broadcast built by ONE token-explode aggregate with
    // 256×2 bounded keys; scoring re-joins that broadcast onto the
    // token stream map-side (no shuffle), the per-doc fold is one
    // doc-keyed combine, and the finish is TakeOrderedAndProject.
    QuerySpec.sqlBacked("q234_dsir_select",
      """WITH toks AS (
        |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t,
        |    CAST(('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 2))
        |      AS INTEGER) AS b
        |  FROM documents),
        |tot AS (SELECT CAST(sum(is_t) AS BIGINT) AS t,
        |          CAST(sum(1 - is_t) AS BIGINT) AS r FROM toks),
        |bc AS (SELECT b, CAST(sum(is_t) AS BIGINT) AS ct,
        |         CAST(sum(1 - is_t) AS BIGINT) AS cr
        |       FROM toks GROUP BY b),
        |w AS (SELECT b,
        |        (1000000 * ((1000000 * ct) // greatest(t, CAST(1 AS BIGINT)))) //
        |          greatest((1000000 * cr) // greatest(r, CAST(1 AS BIGINT)),
        |                   CAST(1 AS BIGINT))
        |          AS w_ppm
        |      FROM bc, tot)
        |SELECT doc_id, n_tok, imp_ppm FROM (
        |  SELECT tk.doc_id, count(*) AS n_tok,
        |    CAST(sum(w.w_ppm) // count(*) AS BIGINT) AS imp_ppm
        |  FROM toks tk JOIN w USING (b)
        |  WHERE tk.is_t = 0
        |  GROUP BY tk.doc_id)
        |ORDER BY imp_ppm DESC, doc_id LIMIT 100""".stripMargin) { (s, dir) =>
      val toks = Tables.spread(s, dir, "documents")
        .select(col("doc_id"),
          when(col("lang") === "en", 1L).otherwise(0L).as("is_t"),
          explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"), col("is_t"),
          expr("CAST(conv(substring(md5(tok), 1, 2), 16, 10) AS INT)")
            .as("b"))
      // toks feeds the model build AND the scoring pass
      Dedup.withScratch(toks) {
        val tot = toks.agg(sum(col("is_t")).as("t"),
          sum(lit(1L) - col("is_t")).as("r"))
        val w = toks.groupBy(col("b"))
          .agg(sum(col("is_t")).as("ct"), sum(lit(1L) - col("is_t")).as("cr"))
          .crossJoin(broadcast(tot))
          .select(col("b"), expr(
            """(1000000 * ((1000000 * ct) div greatest(t, CAST(1 AS BIGINT)))) div
              | greatest((1000000 * cr) div greatest(r, CAST(1 AS BIGINT)),
              |          CAST(1 AS BIGINT))"""
              .stripMargin.replace("\n", "")).as("w_ppm"))
        toks.filter(col("is_t") === 0L)
          .join(broadcast(w), "b")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tok"),
            expr("CAST(sum(w_ppm) div count(*) AS BIGINT)").as("imp_ppm"))
          .orderBy(col("imp_ppm").desc, col("doc_id"))
          .limit(100)
      }
    },

    // ------------------------------------------------------------------
    // q237: OUT-OF-VOCABULARY rate by source against the TRAIN-split
    // vocabulary (the q56/q63 md5-nibble fence) — the tokenizer/vocab
    // coverage audit run before adding a source to the mix: a source
    // whose token stream is full of words the training split never saw
    // will fragment into long subword sequences (q96's fertility cost)
    // or <unk> mass, and this report catches that BEFORE training. Per
    // source: total token occurrences, OOV occurrences, the rate in
    // exact ppm, and the count of distinct unseen word TYPES (many
    // occurrences of one novel word is a different problem than a novel
    // vocabulary). Scale: the vocabulary is vocab-bounded (built by one
    // distinct over the train token stream), the membership probe is a
    // word-keyed equi-join against that bounded side, and the per-source
    // rollup is |sources|-keyed with map-side combine — the corpus is
    // touched exactly once.
    QuerySpec.sqlBacked("q237_oov_rate",
      """WITH w AS (
        |  SELECT source,
        |    strpos('0123456789abcdef',
        |           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS nib,
        |    unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |v AS (SELECT DISTINCT tok FROM w WHERE nib <= 12),
        |o AS (SELECT w.source, w.tok,
        |        CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
        |      FROM w LEFT JOIN v ON w.tok = v.tok)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_tok,
        |  CAST(sum(oov) AS BIGINT) AS n_oov,
        |  (1000000 * CAST(sum(oov) AS BIGINT))
        |    // greatest(CAST(count(*) AS BIGINT), CAST(1 AS BIGINT))
        |    AS oov_ppm,
        |  CAST(count(DISTINCT CASE WHEN oov = 1 THEN tok END) AS BIGINT)
        |    AS n_oov_types
        |FROM o GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val w = Tables.spread(s, dir, "documents")
        .select(col("source"),
          (instr(lit("0123456789abcdef"),
            substring(md5(col("doc_id").cast("string")), 1, 1)) - 1).as("nib"),
          explode(split(col("text"), " ")).as("tok"))
      // the token stream feeds the vocab build AND the membership probe
      Dedup.withScratch(w) {
        val v = w.filter(col("nib") <= 12).select(col("tok")).distinct()
          .withColumn("in_v", lit(1L))
        w.join(v, Seq("tok"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_tok"),
            sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"),
            countDistinct(when(col("in_v").isNull, col("tok")))
              .cast("long").as("n_oov_types"))
          .select(col("source"), col("n_tok"), col("n_oov"),
            expr("""(1000000 * n_oov)
              | div greatest(n_tok, CAST(1 AS BIGINT))"""
              .stripMargin.replace("\n", "")).as("oov_ppm"),
            col("n_oov_types"))
          .orderBy(col("source"))
      }
    },

    // ------------------------------------------------------------------
    // q240: vocabulary COVERAGE curve — the tokenizer-sizing artifact:
    // how many distinct words (taken in descending frequency order)
    // cover 50 / 90 / 99 % of all token occurrences. q74's zipf fit
    // describes the distribution's shape; this is the number a
    // vocabulary budget is actually set from (the gap between the 90
    // and 99 % rows IS the long tail a subword tokenizer exists to
    // absorb). Exact integers end to end: the cumulative is a
    // distributed PrefixSum over the (count desc, token) total order
    // (never a single-task window — the GlobalIndex doctrine), the
    // percent cut is the cross-multiplication cum·100 >= pct·total (no
    // division), vocab_size = qualifying-prefix length derived as
    // (rows below the cut) + 1 and covered = the cutoff row's
    // cumulative — both from ONE aggregate over the vocab-sized frame
    // crossed with the 3-row percent table. Scale: one token-keyed
    // count (map-side combined), one range-shuffle of the vocab-sized
    // frame, one bounded aggregate; the corpus is scanned once.
    QuerySpec.sqlBacked("q240_vocab_coverage",
      """WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok
        |            FROM documents),
        |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n
        |      FROM tk GROUP BY tok),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c),
        |r AS (SELECT tok, n,
        |        CAST(sum(n) OVER (ORDER BY n DESC, tok) AS BIGINT) AS cum
        |      FROM c)
        |SELECT pct,
        |  CAST(sum(CASE WHEN cum * 100 < pct * tot THEN 1 ELSE 0 END) + 1
        |    AS BIGINT) AS vocab_size,
        |  CAST(min(CASE WHEN cum * 100 >= pct * tot THEN cum END)
        |    AS BIGINT) AS covered
        |FROM r, t,
        |  (SELECT unnest([CAST(50 AS BIGINT), CAST(90 AS BIGINT),
        |                  CAST(99 AS BIGINT)]) AS pct)
        |GROUP BY pct ORDER BY pct""".stripMargin) { (s, dir) =>
      val c = Tables.spread(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).cast("long").as("n"))
      Dedup.withScratch(c) {
        val tot = c.agg(sum(col("n")).as("tot"))
        val r = graft.operators.PrefixSum.inclusive(
          c.withColumn("negn", -col("n")),
          Seq(col("negn"), col("tok")), "n", "cum")
        r.crossJoin(broadcast(tot))
          .select(col("cum"), col("tot"),
            explode(array(lit(50L), lit(90L), lit(99L))).as("pct"))
          .groupBy(col("pct"))
          .agg((sum(when(col("cum") * 100 < col("pct") * col("tot"), 1L)
              .otherwise(0L)) + 1L).as("vocab_size"),
            min(when(col("cum") * 100 >= col("pct") * col("tot"),
              col("cum"))).as("covered"))
          .orderBy(col("pct"))
      }
    },

    // ------------------------------------------------------------------
    // q249: PREFIX-SHARING report — the KV-cache planning artifact for
    // serving/eval over a corpus: at prefix depths 4 and 8 tokens, how
    // many documents share an exact prefix with another, and how many
    // prefix tokens a shared-prefix cache (vLLM-style automatic prefix
    // caching, SGLang RadixAttention) would avoid recomputing
    // (Σ (group−1)·depth over groups of >= 2). High sharing says batch
    // by sorted prefix before inference; near-zero says the cache buys
    // nothing and the scheduler can skip it. Exact integers end to
    // end. Scale: per depth one prefix-keyed count with map-side
    // combine (the prefix is a bounded projection of the scan), folded
    // into a 1-row-per-depth report; depths are a 2-way union of the
    // same shape, one corpus scan each.
    QuerySpec.sqlBacked("q249_prefix_sharing", {
      def layer(d: Int) =
        s"""SELECT CAST($d AS BIGINT) AS depth,
           |  CAST(count(*) AS BIGINT) AS n_prefixes,
           |  CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_groups_shared,
           |  CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
           |    AS n_docs_shared,
           |  CAST(sum(CASE WHEN c >= 2 THEN (c - 1) * $d ELSE 0 END)
           |    AS BIGINT) AS saved_tokens
           |FROM (SELECT p, count(*) AS c FROM (
           |        SELECT array_to_string(ws[1:$d], ' ') AS p
           |        FROM (SELECT string_split(text, ' ') AS ws
           |              FROM documents)
           |        WHERE len(ws) >= $d) GROUP BY p)""".stripMargin
      s"""SELECT * FROM (${layer(4)}
         |UNION ALL ${layer(8)})
         |ORDER BY depth""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.spread(s, dir, "documents")
        .select(split(col("text"), " ").as("ws"))
      def layer(d: Int) = docs
        .filter(size(col("ws")) >= d)
        .select(expr(s"array_join(slice(ws, 1, $d), ' ')").as("p"))
        .groupBy(col("p"))
        .agg(count(lit(1)).cast("long").as("c"))
        .agg(count(lit(1)).cast("long").as("n_prefixes"),
          sum(when(col("c") >= 2, 1L).otherwise(0L)).as("n_groups_shared"),
          sum(when(col("c") >= 2, col("c")).otherwise(0L))
            .as("n_docs_shared"),
          sum(when(col("c") >= 2, (col("c") - 1) * d).otherwise(0L))
            .as("saved_tokens"))
        .select(lit(d.toLong).as("depth"), col("n_prefixes"),
          col("n_groups_shared"), col("n_docs_shared"), col("saved_tokens"))
      layer(4).unionByName(layer(8)).orderBy(col("depth"))
    },

    // ------------------------------------------------------------------
    // q254: SPLIT-PARITY audit — is the md5-nibble train/eval fence
    // actually distribution-neutral? The exact total-variation distance
    // (q128's integer arithmetic: Σ|na·N_b − nb·N_a| over score
    // buckets, one double division at the read) between the TRAIN and
    // EVAL splits' classifier-score distributions. A random fence
    // should sit near zero; a large TV means the eval set is not
    // exchangeable with train and every eval number downstream (q226's
    // accuracy, q215/q232's recall sample) carries that bias. This is
    // the sanity check a split convention ships with — run once per
    // corpus snapshot, before anything is graded against the fence.
    // Scale: per-doc score is the shared classifierScore projection
    // (scored over RAW text — no stopword heuristic needed here);
    // buckets are score-range-bounded; one grouped count + a 1-row
    // report off a scratch-persisted bucket frame.
    QuerySpec.sqlBacked("q254_split_parity",
      s"""WITH sc AS (
         |  SELECT CAST($classifierScoreSql AS BIGINT) AS si,
         |    strpos('0123456789abcdef',
         |           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS nib
         |  FROM documents),
         |g AS (SELECT si // 250000 AS bucket,
         |    CAST(count(*) FILTER (WHERE nib <= 12) AS BIGINT) AS na,
         |    CAST(count(*) FILTER (WHERE nib >= 14) AS BIGINT) AS nb
         |  FROM sc WHERE nib <> 13 GROUP BY bucket),
         |t AS (SELECT CAST(sum(na) AS BIGINT) AS n_a,
         |        CAST(sum(nb) AS BIGINT) AS n_b FROM g)
         |SELECT n_a, n_b,
         |  CAST(sum(abs(na * n_b - nb * n_a)) AS BIGINT) AS tv_num,
         |  2 * n_a * n_b AS tv_den,
         |  CAST(CAST(sum(abs(na * n_b - nb * n_a)) AS BIGINT) AS DOUBLE)
         |    / CAST(2 * n_a * n_b AS DOUBLE) AS tv
         |FROM g, t GROUP BY n_a, n_b""".stripMargin) { (s, dir) =>
      val sc = Tables.spread(s, dir, "documents")
        .select(
          (instr(lit("0123456789abcdef"),
            substring(md5(col("doc_id").cast("string")), 1, 1)) - 1)
            .as("nib"),
          classifierScore.as("si"))
        .filter(col("nib") =!= 13)
      val g = sc
        .select(expr("si div 250000").as("bucket"), col("nib"))
        .groupBy(col("bucket"))
        .agg(sum(when(col("nib") <= 12, 1L).otherwise(0L)).as("na"),
          sum(when(col("nib") >= 14, 1L).otherwise(0L)).as("nb"))
      // g feeds the totals AND the TV fold — persist once or the
      // per-token md5 scoring pass runs twice
      Dedup.withScratch(g) {
        val t = g.agg(sum(col("na")).as("n_a"), sum(col("nb")).as("n_b"))
        g.crossJoin(broadcast(t))
          .groupBy(col("n_a"), col("n_b"))
          .agg(sum(abs(col("na") * col("n_b") - col("nb") * col("n_a")))
            .as("tv_num"))
          .select(col("n_a"), col("n_b"), col("tv_num"),
            (lit(2L) * col("n_a") * col("n_b")).as("tv_den"))
          .withColumn("tv",
            col("tv_num").cast("double") / col("tv_den").cast("double"))
      }
    },

    // ------------------------------------------------------------------
    // q251: BPE VOCABULARY UTILIZATION — per piece of the trained
    // tokenizer (q130's merge table), how many distinct corpus words
    // contain it and how many token occurrences it absorbs when the
    // corpus is encoded, with the share in exact ppm. This is the
    // tokenizer-health report read next to q240's coverage curve: a
    // merged piece with near-zero occurrence share is a wasted vocab
    // slot (trained on a frequency spike that doesn't generalize), and
    // the head pieces' shares are what decide whether the next merge
    // round is worth its embedding row. Occurrences come FREE from the
    // training histogram (repr pieces weighted by the word's corpus
    // count — no second corpus pass). Scale: everything after the
    // histogram is vocab-bounded; the report is piece-inventory-sized.
    QuerySpec.sqlBacked("q251_bpe_utilization",
      s"""WITH ${bpeCtesSql(BpeRounds)},
         |pc AS (SELECT p, CAST(count(DISTINCT word) AS BIGINT) AS n_words,
         |         CAST(sum(n) AS BIGINT) AS n_occ
         |       FROM (SELECT word, n,
         |               unnest(string_split(repr, ' ')) AS p
         |             FROM v$BpeRounds)
         |       GROUP BY p),
         |t AS (SELECT CAST(sum(n_occ) AS BIGINT) AS tot FROM pc)
         |SELECT p AS piece, n_words, n_occ,
         |  (1000000 * n_occ) // tot AS share_ppm
         |FROM pc, t ORDER BY piece""".stripMargin) { (s, dir) =>
      val (_, vocab) = bpeTrain(s, dir, BpeRounds)
      val pc = vocab
        .select(col("word"), col("n"),
          explode(split(col("repr"), " ")).as("p"))
        .groupBy(col("p"))
        .agg(countDistinct(col("word")).cast("long").as("n_words"),
          sum(col("n")).as("n_occ"))
      Dedup.withScratch(pc) {
        pc.crossJoin(broadcast(pc.agg(sum(col("n_occ")).as("tot"))))
          .select(col("p").as("piece"), col("n_words"), col("n_occ"),
            expr("(1000000 * n_occ) div tot").as("share_ppm"))
          .orderBy(col("piece"))
      }
    },

    // ------------------------------------------------------------------
    // q250: HAPAX share by source — the lexical-richness/quality signal
    // that separates generative diversity from template spam: per
    // source, the share of word TYPES occurring exactly once in that
    // source (hapax legomena) and the share of token OCCURRENCES those
    // hapaxes carry. Natural text sits near a stable hapax-type band
    // (Zipf's tail, q74's fit); a source far BELOW it is
    // boilerplate/templated (few novel words), far ABOVE is OCR noise
    // or mojibake (every error a new "word") — both are triage flags
    // before mixing. Exact ppm integers. Scale: one (source, word)
    // count with map-side combine, one |sources|-keyed rollup; the
    // corpus is scanned once.
    QuerySpec.sqlBacked("q250_hapax_by_source",
      """WITH t AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n
        |      FROM t GROUP BY source, tok)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hapax,
        |  CAST(sum(n) AS BIGINT) AS n_tokens,
        |  (1000000 * CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT))
        |    // CAST(count(*) AS BIGINT) AS hapax_type_ppm,
        |  (1000000 * CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT))
        |    // CAST(sum(n) AS BIGINT) AS hapax_token_ppm
        |FROM c GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      Tables.spread(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).cast("long").as("n"))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_types"),
          sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_hapax"),
          sum(col("n")).as("n_tokens"))
        .select(col("source"), col("n_types"), col("n_hapax"),
          col("n_tokens"),
          expr("(1000000 * n_hapax) div n_types").as("hapax_type_ppm"),
          expr("(1000000 * n_hapax) div n_tokens").as("hapax_token_ppm"))
        .orderBy(col("source"))
    },

    // ------------------------------------------------------------------
    // q213: blocklist scan — how many DISTINCT flag phrases occur in
    // each document, via the native Aho–Corasick ContainsAny expression
    // (plans/ContainsAny.scala): the filtering primitive behind
    // toxic-phrase / PII-trigger / license-string blocklists. The
    // oracle's per-pattern `contains` CASE sum re-scans the text once
    // per pattern — fine for its 8 phrases, but the production shape
    // is a 10k-phrase list where that plan costs 10,000 corpus passes;
    // the automaton pays O(|text|) per document regardless of P, built
    // once at plan time and shipped as a codegen reference object.
    // Exact substring semantics (case-sensitive), so the two
    // formulations agree bit-for-bit; flagged = n_hits > 0 is the gate
    // a curation pipeline actually branches on.
    QuerySpec.sqlBacked("q213_blocklist_scan", {
      val hits = BlockPatterns
        .map(p => s"(CASE WHEN contains(text, '$p') THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""SELECT doc_id, CAST($hits AS INT) AS n_hits,
         |  ($hits) > 0 AS flagged
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      Tables.spread(s, dir, "documents")
        .select(col("doc_id"),
          graft.plans.ContainsAny(col("text"), BlockPatterns).as("n_hits"))
        .select(col("doc_id"), col("n_hits"),
          (col("n_hits") > 0).as("flagged"))
        .orderBy(col("doc_id"))
    }
  )

  /** q213's flag-phrase list — configuration, embedded as a literal on
    * both engines (single words and cross-token phrases so the
    * substring — not token — semantics is exercised). Declared before
    * use via def-site ordering concerns: it feeds `specs` eagerly. */
  private def BlockPatterns: Seq[String] = Seq(
    "dup", "slow scan", "drop table", "spark join",
    "bad data", "key value", "merge batch", "big query")

  /** q180/q183's shared model CTEs: bigram counts (bi), left-context
    * totals and continuation fan-outs (uni/cont), the distinct-bigram
    * total (tot), and `kn` — every observed bigram with its interpolated
    * Kneser–Ney probability as the exact BIGINT rational kn_num/kn_den
    * (discount 3/4; see the q180 comment for the algebra). ONE
    * definition consumed by both gates, so the model q183 scores with is
    * provably the model q180 publishes. */
  private def knCtesSql: String = knCtesSql("documents")

  /** [[knCtesSql]] over an arbitrary doc-source SQL fragment (must
    * expose a `text` column) — q226 trains on the split's train half
    * only; q180/q183 keep the whole-corpus default. */
  private def knCtesSql(from: String): String =
    s"""w AS (SELECT string_split(text, ' ') AS ws FROM $from
      |           WHERE len(string_split(text, ' ')) >= 2),""".stripMargin +
    """
      |bi AS (SELECT ws[i] AS w1, ws[i+1] AS w2,
      |         CAST(count(*) AS BIGINT) AS c
      |       FROM w, unnest(range(1, len(ws))) AS t(i) GROUP BY w1, w2),
      |uni AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cw1,
      |          CAST(count(*) AS BIGINT) AS n1w1 FROM bi GROUP BY w1),
      |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS ncont
      |         FROM bi GROUP BY w2),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS b FROM bi),
      |kn AS (SELECT bi.w1 AS w1, bi.w2 AS w2, c, cw1, n1w1, ncont,
      |  CAST((4 * c - 3) * b + 3 * n1w1 * ncont AS BIGINT) AS kn_num,
      |  CAST(4 * cw1 * b AS BIGINT) AS kn_den
      |  FROM bi JOIN uni USING (w1) JOIN cont ON bi.w2 = cont.w2, tot)"""
      .stripMargin

  /** The Spark twin of [[knCtesSql]]'s `kn` table: KN-scored bigrams
    * with `minC` pruning the bigram table BEFORE the stat joins (q180
    * publishes c >= 5; q183's model takes everything). The
    * divide-compare guard fails loudly where (4c−3)·B would leave
    * Long — widen to DECIMAL there — rather than silently wrapping
    * where DuckDB would error (q172 doctrine); each addend of kn_num
    * gets half the headroom, kn_den the whole of it. */
  private def knScores(s: SparkSession, dir: String,
      minC: Long = 1L): org.apache.spark.sql.DataFrame = {
    val bi = Tables.spread(s, dir, "documents")
      .select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"))
        .as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
    // bi feeds FOUR lineages (itself, uni, cont, tot): without a scratch
    // persist each one re-runs the corpus explode + bigram aggregation,
    // so q180/q183 paid the scan ~4x (round-7 advisory). The persisted
    // frame is the vocab^2-bounded bigram table, not the corpus.
    Dedup.withScratch(bi)(knFromCounts(bi, minC))
  }

  /** The interpolated-KN derivation from an already-built bigram count
    * table (w1, w2, c) — q180's algebra past the corpus scan, shared
    * VERBATIM by the batch path above and the streaming twin
    * ([[graft.streaming.IncrementalKneserNey.modelFrom]]), so twin-vs-
    * batch parity compares one implementation against the DuckDB
    * oracle, not two against each other. Every stat frame here is a
    * vocab-bounded dimension; `counts` should be persisted by the
    * caller (read four times). */
  private[graft] def knFromCounts(bi: org.apache.spark.sql.DataFrame,
      minC: Long): org.apache.spark.sql.DataFrame = {
    val uni = bi.groupBy(col("w1"))
      .agg(sum(col("c")).as("cw1"), count(lit(1)).as("n1w1"))
    val cont = bi.groupBy(col("w2"))
      .agg(count(lit(1)).as("ncont"))
    val tot = bi.agg(count(lit(1)).as("b"))
    (if (minC > 1L) bi.filter(col("c") >= minC) else bi)
      .join(uni, "w1").join(cont, "w2")
      .crossJoin(broadcast(tot))
      .withColumn("b", when(
        (col("c") * 4 > expr("4500000000000000000L div b")) ||
        (col("cw1") * 4 > expr("9000000000000000000L div b")) ||
        (col("n1w1") > expr("1500000000000000000L div ncont")),
        expr("raise_error('graft q180: Kneser-Ney numerator exceeds " +
          "BIGINT headroom - widen to DECIMAL')").cast("long"))
        .otherwise(col("b")))
      .select(col("w1"), col("w2"), col("c"), col("cw1"), col("n1w1"),
        col("ncont"),
        ((col("c") * 4 - 3) * col("b")
          + col("n1w1") * col("ncont") * 3).as("kn_num"),
        (col("cw1") * 4 * col("b")).as("kn_den"))
  }

  /** The q130 oracle's training chain as shared CTEs: v0 (word
    * histogram, space-separated symbol repr) through b1/v1 … b{r}/v{r}
    * — each round's argmax pair (count DESC, lhs, rhs tiebreak) and the
    * vocabulary AFTER applying it. q130 reads the b's, q149 reads the
    * final v. */
  private def bpeCtesSql(rounds: Int): String = {
    val fold = (b: String) => s"""list_reduce(string_split(repr, ' '),
       |  (acc, x) -> CASE
       |    WHEN x = $b.rhs AND (acc = $b.lhs OR (length(acc) > length($b.lhs)
       |      AND substr(acc, length(acc) - length($b.lhs) + 1) = $b.lhs
       |      AND substr(acc, length(acc) - length($b.lhs), 1) = ' '))
       |    THEN substr(acc, 1, length(acc) - length($b.lhs)) || $b.lhs || $b.rhs
       |    ELSE acc || ' ' || x END)""".stripMargin
    def pairs(src: String) =
      s"""(SELECT ss[i] AS lhs, ss[i+1] AS rhs, CAST(sum(n) AS BIGINT) AS c
         |  FROM (SELECT n, string_split(repr, ' ') AS ss FROM $src),
         |       unnest(range(1, len(ss))) AS t(i)
         |  GROUP BY lhs, rhs)""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS ${pairs(s"v${r - 1}")},
         |b$r AS (SELECT lhs, rhs, c FROM p$r ORDER BY c DESC, lhs, rhs LIMIT 1),
         |v$r AS (SELECT word, n, ${fold(s"b$r")} AS repr FROM v${r - 1}, b$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""v0 AS (
       |  SELECT w AS word, CAST(count(*) AS BIGINT) AS n,
       |         array_to_string(string_split(w, ''), ' ') AS repr
       |  FROM documents, unnest(string_split(text, ' ')) AS t(w)
       |  WHERE len(w) > 0 GROUP BY w),
       |$roundCtes""".stripMargin
  }

  /** The distributed BPE training loop shared by q130 (merge table) and
    * q149 (final vocabulary): corpus scanned ONCE into the word
    * histogram, each round = vocab-sized pair aggregate → ONE broadcast
    * argmax row → projection fold, lineage cut per round. Returns the
    * per-round 1-row merge frames and the vocabulary AFTER the last
    * merge. */
  /** The BPE-encode oracle (train v0..v4 via bpeCtesSql, then score
    * every document against the final vocabulary) — shared VERBATIM by
    * q149 (inline train+encode) and q189 (persisted-vocab serve). */
  private def bpeEncodeOracleSql: String =
    s"""WITH ${bpeCtesSql(BpeRounds)},
       |enc AS (SELECT word, CAST(len(string_split(repr, ' ')) AS BIGINT)
       |          AS np
       |        FROM v$BpeRounds),
       |d AS (SELECT doc_id, w AS word
       |      FROM documents, unnest(string_split(text, ' ')) AS t(w)
       |      WHERE len(w) > 0)
       |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(e.np) AS BIGINT) AS n_pieces,
       |  CAST(sum(e.np) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |    AS pieces_per_word
       |FROM d JOIN enc e ON e.word = d.word
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  /** The encode tail shared by q149 and q189: corpus words joined to a
    * (word, repr) vocabulary, per-doc piece accounting. */
  private def bpeEncodeWith(s: SparkSession, dir: String,
      vocab: DataFrame): DataFrame = {
    val enc = vocab
      .select(col("word"),
        size(split(col("repr"), " ")).cast("long").as("np"))
    Tables.spread(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(enc, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("np")).as("n_pieces"))
      .select(col("doc_id"), col("n_words"), col("n_pieces"),
        (col("n_pieces").cast("double") / col("n_words").cast("double"))
          .as("pieces_per_word"))
      .orderBy(col("doc_id"))
  }

  /** Per-JVM BPE tokenizer cache: corpus dir -> persisted vocab base.
    * The build is q130's training ([[bpeTrain]], the SAME code q149
    * runs inline); the persisted table is (word, repr) — the frozen
    * tokenizer every later shard encodes against. Temp dir registered
    * for deletion at JVM exit (the q187 hygiene). */
  private val bpeVocabCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def bpeVocabIndex(s: SparkSession, dir: String): String =
    bpeVocabCache.computeIfAbsent(dir, _ => {
      val base = graft.sources.IO.tempDirCleanedAtExit("graft_bpe_vocab")
      val (_, vocab) = bpeTrain(s, dir, BpeRounds)
      vocab.select(col("word"), col("repr"))
        .write.mode("overwrite").parquet(s"$base/bpe_vocab.parquet")
      base.toString
    })

  private def bpeTrain(s: SparkSession, dir: String,
      rounds: Int): (Seq[DataFrame], DataFrame) = {
    val hist = Tables.spread(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    bpeTrainFromHist(hist, rounds)
  }

  /** The DISTRIBUTED BPE merge fold over an explicit (word, n) histogram
    * frame — the whole training after the corpus scan. Shared verbatim
    * by batch q130/q149 (via [[bpeTrain]]) and the streaming twin
    * ([[graft.streaming.IncrementalBpe]].model — the knFromCounts
    * doctrine: twin and batch share the derivation, so parity pins ONE
    * implementation against the DuckDB oracle instead of two against
    * each other). Nothing here touches the driver beyond each round's
    * single argmax row. */
  private[graft] def bpeTrainFromHist(hist: DataFrame,
      rounds: Int): (Seq[DataFrame], DataFrame) = {
    val foldCase = bpeFoldCase
    var vocab = hist
      .select(col(hist.columns(0)).as("word"), col(hist.columns(1)).as("n"))
      .withColumn("repr", concat_ws(" ", split(col("word"), "")))
      .localCheckpoint()
    var merges = Seq.empty[DataFrame]
    for (r <- 1 to rounds) {
      val best = vocab
        .select(col("n"), split(col("repr"), " ").as("ss"))
        .filter(size(col("ss")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(0, size(ss) - 2), " +
            "i -> struct(ss[i] AS lhs, ss[i + 1] AS rhs))")).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("n")).as("c"))
        .agg(min(struct((-col("c")).as("nc"), col("lhs").as("l"),
          col("rhs").as("r"))).as("m"))
        .select(col("m.l").as("lhs"), col("m.r").as("rhs"),
          (-col("m.nc")).as("c"))
        .localCheckpoint()
      // fail-loud on a degenerate corpus (no adjacent pair anywhere):
      // the aggregate would emit a NULL merge row where the oracle's
      // LIMIT 1 over an empty pair table empties the vocabulary — the
      // engines would silently diverge. One driver-side row on an
      // already-materialized 1-row frame (the q39/PageRank doctrine).
      require(best.head().getAs[String]("lhs") != null,
        s"graft q130: merge round $r found no adjacent symbol pair - " +
          "the corpus vocabulary is single-symbol; reduce rounds")
      merges = merges :+ best.withColumn("round", lit(r.toLong))
      vocab = vocab
        .crossJoin(broadcast(best.select(col("lhs"), col("rhs"))))
        .withColumn("ss", split(col("repr"), " "))
        .withColumn("repr", expr(foldCase))
        .select(col("word"), col("n"), col("repr"))
        .localCheckpoint()
    }
    (merges, vocab)
  }
}
