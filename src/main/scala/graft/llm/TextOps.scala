package graft.llm

import graft.Tables._
import graft.QuerySpec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines over
  * the `documents` table: language ID, quality scoring, token counting,
  * document fingerprinting.
  *
  * Everything is built from codegen'd builtins + higher-order functions —
  * no UDFs — so the whole surface stays inside WholeStageCodegen and
  * scales embarrassingly parallel (per-document, no shuffle except the
  * final deterministic sort).
  *
  * Cross-engine determinism: all derived numbers are integers (counts or
  * `div`-scaled ratios) — no floating-point drift against the DuckDB
  * oracle.
  */
object TextOps {

  /** k-char shingle array: positions 1..max(len-k+1, 1). Shared by the
    * dedup/fingerprint family (Dedup.scala). */
  def charShingles(k: Int): Column =
    expr(s"transform(sequence(1, greatest(length(text) - ${k - 1}, 1)), i -> substring(text, i, $k))")

  /** Exploded (doc_id, shingle) rows. Faster than exploding
    * `charShingles` directly: the position sequence explodes as a
    * primitive int array and `substring` stays inside WholeStageCodegen,
    * instead of building per-row string arrays in an interpreted
    * `transform` lambda. */
  def shingleRows(docs: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), greatest(length(col("text")) - (k - 1), lit(1))))
          .as("i"))
      .select(col("doc_id"), expr(s"substring(text, i, $k)").as("s"))

  /** Whitespace tokens with empties dropped (split on runs-of-spaces
    * parity with the oracle's string_split + filter). */
  val tokens: Column = expr("filter(split(lower(text), ' '), w -> w != '')")

  /** DuckDB SQL for Spark's `conv(substring(md5(X), 1, 8), 16, 10)` —
    * the first 32 md5 bits decoded digit-by-digit (DuckDB has no conv).
    * ONE definition for the 7 oracles that hash this way: a drift in
    * any copy silently desynchronizes a Spark/DuckDB pair. */
  def md5Hex32Sql(md5Arg: String): String =
    (0 until 8).map(i =>
      s"(strpos('0123456789abcdef', substr(md5($md5Arg), ${i + 1}, 1)) - 1) * ${1L << (4 * (7 - i))}")
      .mkString(" + ")

  /** The winnowing pick CTE block (docs8 → grams → per-window MIN of the
    * encoded (hash, pos) key) shared verbatim by the winnow_fingerprint
    * and shared_passage_pairs oracles. */
  private def winnowPickCteSql: String =
    s"""docs8 AS (
          SELECT doc_id, text, CAST(length(text) - 7 AS BIGINT) AS n
          FROM documents WHERE length(text) >= 8),
        g AS (
          SELECT doc_id, n, CAST(i AS BIGINT) AS pos,
                 CAST(${md5Hex32Sql("substr(text, CAST(i AS INTEGER), 8)")} AS BIGINT) AS v
          FROM docs8,
               UNNEST(generate_series(1, CAST(length(text) - 7 AS INTEGER))) AS t(i)),
        pick AS (
          SELECT a.doc_id, a.pos AS s, MIN((b.v + 1) * 1048576 - b.pos) AS k
          FROM g a JOIN g b ON b.doc_id = a.doc_id
                           AND b.pos BETWEEN a.pos AND a.pos + 3
          WHERE a.pos <= a.n - 3
          GROUP BY a.doc_id, a.pos)"""

  private def stopCount(words: Seq[String]): String = {
    val set = words.map(w => s"'$w'").mkString(", ")
    s"size(filter(split(lower(text), ' '), w -> w IN ($set)))"
  }

  private val langs: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "das", "ist"),
    "fr" -> Seq("le", "et", "les", "une"),
    "es" -> Seq("el", "los", "que", "para"))

  /** One definition per PII pattern — shared by pii_detect, pii_redact
    * and the corpus_clean gate, Spark side AND (via interpolation) the
    * oracles: editing a pattern in one key but not another would
    * silently desynchronize the composed gate from its components.
    * Patterns stay in the Java/RE2-agreeing regex subset. */
  private[llm] val piiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[llm] val piiUrl = "https?://[^ ]+"
  private[llm] val piiDigits = "[0-9]{7,}"

  /** Per-language marker-word counts (cnt_en..cnt_es) — the lang_id
    * machinery, shared with corpus_clean's language gate. */
  private def withLangCounts(df: DataFrame): DataFrame =
    langs.foldLeft(df) { case (acc, (l, ws)) =>
      acc.withColumn(s"cnt_$l", expr(stopCount(ws)).cast("long")) }

  /** Language ID via stopword n-gram heuristic: count per-language marker
    * words, argmax with a fixed precedence order (en > de > fr > es) so
    * ties are deterministic. */
  val langId = QuerySpec(
    "lang_id",
    (s, d) => {
      val withCounts = withLangCounts(documents(s, d))
      val best = greatest(langs.map { case (l, _) => col(s"cnt_$l") }: _*)
      val pred = langs.foldRight(lit("und"): Column) { case ((l, _), el) =>
        when(col(s"cnt_$l") === best && best > 0, lit(l)).otherwise(el)
      }
      withCounts
        .select(col("doc_id"), col("cnt_en"), col("cnt_de"), col("cnt_fr"),
          col("cnt_es"), pred.as("pred_lang"), col("lang").as("claimed_lang"),
          (pred === col("lang")).as("is_match"))
        .orderBy("doc_id")
    },
    Some {
      def c(ws: Seq[String]) =
        s"len(list_filter(string_split(lower(text), ' '), w -> w IN (${ws.map(w => s"'$w'").mkString(", ")})))"
      val cnts = langs.map { case (l, ws) => s"${c(ws)} AS cnt_$l" }.mkString(", ")
      """WITH counts AS (SELECT doc_id, lang, CNTS FROM documents)
         SELECT doc_id, cnt_en, cnt_de, cnt_fr, cnt_es,
                CASE WHEN cnt_en = g AND g > 0 THEN 'en'
                     WHEN cnt_de = g AND g > 0 THEN 'de'
                     WHEN cnt_fr = g AND g > 0 THEN 'fr'
                     WHEN cnt_es = g AND g > 0 THEN 'es'
                     ELSE 'und' END AS pred_lang,
                lang AS claimed_lang,
                (CASE WHEN cnt_en = g AND g > 0 THEN 'en'
                      WHEN cnt_de = g AND g > 0 THEN 'de'
                      WHEN cnt_fr = g AND g > 0 THEN 'fr'
                      WHEN cnt_es = g AND g > 0 THEN 'es'
                      ELSE 'und' END = lang) AS is_match
         FROM (SELECT *, greatest(cnt_en, cnt_de, cnt_fr, cnt_es) AS g FROM counts)
         ORDER BY doc_id"""
        .replace("CNTS", cnts)
    }
  )

  /** The 7-word stopword list behind quality_score's stop_milli and
    * quality_band_filter's banding signal — ONE definition, or the band
    * thresholds silently drift off the score they claim to band. */
  private val stopWords7 = Seq("the", "and", "of", "is", "a", "to", "in")

  /** DuckDB SQL for the stop_milli signal (stopword density per 1000
    * tokens) — the quality_band_filter oracle's banding input, mirroring
    * quality_score's stop_milli math over `stopWords7`. */
  private def stopMilliSql: String =
    s"""(1000 * len(list_filter(string_split(lower(text), ' '),
           w -> w IN (${stopWords7.map(w => s"'$w'").mkString(",")}))))
        // greatest(len(list_filter(string_split(lower(text), ' '), w -> w <> '')), 1)"""

  /** Quality scoring: length / punctuation / stopword / word-shape
    * signals, emitted as exact integer ratios (`div`-scaled milli-units). */
  val qualityScore = QuerySpec(
    "quality_score",
    (s, d) =>
      documents(s, d)
        .select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_char"),
          size(tokens).cast("long").as("n_tokens"),
          expr(stopCount(stopWords7))
            .cast("long").as("stop_cnt"),
          length(regexp_replace(col("text"), "[^A-Za-z]", ""))
            .cast("long").as("alpha_cnt"),
          length(regexp_replace(col("text"), "[^.,;:!?]", ""))
            .cast("long").as("punct_cnt"))
        .select(
          col("doc_id"), col("n_char"), col("n_tokens"), col("stop_cnt"),
          col("alpha_cnt"), col("punct_cnt"),
          // greatest(…,1): empty/whitespace-only docs would otherwise hit
          // ANSI DIVIDE_BY_ZERO (Spark 4 default) where DuckDB yields NULL
          expr("(1000 * stop_cnt) div greatest(n_tokens, 1)").as("stop_milli"),
          expr("(1000 * alpha_cnt) div greatest(n_char, 1)").as("alpha_milli"),
          expr("(10 * alpha_cnt) div greatest(n_tokens, 1)").as("wordlen_deci"))
        .orderBy("doc_id"),
    Some(s"""WITH base AS (
              SELECT doc_id,
                     length(text) AS n_char,
                     len(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS n_tokens,
                     len(list_filter(string_split(lower(text), ' '),
                         w -> w IN (${stopWords7.map(w => s"'$w'").mkString(",")}))) AS stop_cnt,
                     length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_cnt,
                     length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct_cnt
              FROM documents)
            SELECT doc_id, n_char, n_tokens, stop_cnt, alpha_cnt, punct_cnt,
                   (1000 * stop_cnt) // greatest(n_tokens, 1) AS stop_milli,
                   (1000 * alpha_cnt) // greatest(n_char, 1) AS alpha_milli,
                   (10 * alpha_cnt) // greatest(n_tokens, 1) AS wordlen_deci
            FROM base ORDER BY doc_id""")
  )

  /** Per-language quality banding (head / middle / tail by stopword
    * density) — the CCNet-style curation step that keeps each language's
    * best two thirds instead of one global threshold (which would crush
    * low-resource languages whose score distribution sits lower).
    *
    * The 100 TB shape: NO per-language global sort. The signal is an
    * integer milli-ratio with a DOMAIN-BOUNDED value space (≤ 1001
    * values), so per-language tercile thresholds come from a
    * (lang, value) histogram of ≤ n_langs·1001 rows; the cumulative
    * window runs over that bounded table only, and band assignment joins
    * back map-side. The band table is domain-bounded — NOT
    * corpus-proportional — so its broadcast is the sanctioned
    * config-sized kind (ann_pq-codebook class), unlike the banned
    * corpus-derived broadcasts. Ties share a band by construction
    * (banding is a function of the VALUE), which is what makes the
    * integer math deterministic across engines. */
  /** The scored/hist/bands CTE block matching [[qualityBandOf]], shared
    * verbatim by the quality_band_filter and pipeline_quality_pack
    * oracles — a drift in either copy would silently put the composed
    * pipeline on a different band table than the component key. */
  private def qualityBandCteSql: String =
    s"""scored AS (
              SELECT doc_id, COALESCE(lang, '') AS lang,
                     COALESCE($stopMilliSql, -1) AS q
              FROM documents),
            hist AS (SELECT lang, q AS v, count(*) AS cnt FROM scored
                     WHERE q >= 0 GROUP BY 1, 2),
            bands AS (
              SELECT lang, v,
                     CAST(1 + least(2,
                       (3 * COALESCE(SUM(cnt) OVER (PARTITION BY lang ORDER BY v DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
                       // SUM(cnt) OVER (PARTITION BY lang)) AS BIGINT) AS band
              FROM hist)"""

  /** The quality-band plan over any (doc_id, lang, text) frame — shared
    * by the query key and the composed pipeline_quality_pack.
    *
    * Cast to BIGINT BEFORE the 1000× (exactly quality_score's long
    * math and the oracle's len()→BIGINT): an int multiply would hit
    * ANSI ARITHMETIC_OVERFLOW on a >2.1M-stopword doc where both
    * quality_score and DuckDB succeed.
    * NULL lang / NULL text coalesce to sentinels ('' / -1) instead of
    * silently vanishing: a NULL never matches the band equi-join, so
    * without the sentinel such docs would be neither kept nor
    * rejected — lost from the curation profile without trace. With
    * it, every input doc appears in the output: NULL-lang docs band
    * among themselves under lang='', and a NULL-text doc (q=-1, no
    * score to band on) is assigned band 3 / keep_flag 0 UNCONDITIONALLY
    * — the histogram is built over real scores only, so score-less
    * docs can neither dilute a language's terciles nor sneak into
    * band 1 of a sentinel-dominated language. */
  def qualityBandOf(docs: DataFrame): DataFrame = {
    val scored = docs
      .select(col("doc_id"), coalesce(col("lang"), lit("")).as("lang"),
        coalesce(
          expr(s"(1000 * cast(${stopCount(stopWords7)} as bigint)) " +
            "div greatest(cast(size(filter(split(lower(text), ' '), w -> w != '')) as bigint), 1)"),
          lit(-1L)).as("q"))
    val hist = scored.filter(col("q") >= 0)
      .groupBy(col("lang"), col("q").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val above = Window.partitionBy("lang").orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy("lang")
    val bands = hist
      .withColumn("cum", coalesce(sum(col("cnt")).over(above), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(whole))
      .select(col("lang").as("bl"), col("v"),
        expr("1 + least(2, (3 * cum) div n)").cast("long").as("band"))
    scored
      .join(broadcast(bands),
        col("lang") === col("bl") && col("q") === col("v"), "left")
      .select(col("doc_id"), col("lang"), col("q").as("stop_milli"),
        coalesce(col("band"), lit(3L)).as("band"),
        (coalesce(col("band"), lit(3L)) <= 2).cast("long").as("keep_flag"))
  }

  val qualityBandFilter = QuerySpec(
    "quality_band_filter",
    (s, d) => qualityBandOf(documents(s, d)).orderBy("doc_id"),
    Some(s"""WITH $qualityBandCteSql
            SELECT s.doc_id, s.lang, s.q AS stop_milli,
                   CAST(COALESCE(b.band, 3) AS BIGINT) AS band,
                   CAST(COALESCE(b.band, 3) <= 2 AS BIGINT) AS keep_flag
            FROM scored s LEFT JOIN bands b ON b.lang = s.lang AND b.v = s.q
            ORDER BY doc_id""")
  )

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation). */
  val tokenCount = QuerySpec(
    "token_count",
    (s, d) =>
      documents(s, d)
        .select(
          col("doc_id"),
          size(tokens).cast("long").as("ws_tokens"),
          size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)"))
            .cast("long").as("bpe_tokens"),
          length(col("text")).cast("long").as("n_char"))
        .withColumn("chars_per_tok_milli",
          expr("(1000 * n_char) div greatest(bpe_tokens, 1)"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   len(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_tokens,
                   length(text) AS n_char,
                   (1000 * length(text)) //
                     greatest(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')), 1)
                     AS chars_per_tok_milli
            FROM documents ORDER BY doc_id""")
  )

  /** Document fingerprinting via rolling shingle hashes: the winnowing-
    * style (min, max) of md5 over 8-char shingles plus the distinct
    * shingle count — a compact per-doc signature for near-dup triage. */
  val docFingerprint = QuerySpec(
    "doc_fingerprint",
    (s, d) =>
      shingleRows(documents(s, d), 8)
        .groupBy("doc_id")
        .agg(
          min(md5(col("s"))).as("fp_min"),
          max(md5(col("s"))).as("fp_max"),
          count_distinct(col("s")).as("n_shingles"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, min(md5(s)) AS fp_min, max(md5(s)) AS fp_max,
                   count(DISTINCT s) AS n_shingles
            FROM (SELECT doc_id, substr(text, i, 8) AS s
                  FROM documents,
                       UNNEST(generate_series(1, greatest(length(text)-7, 1))) AS t(i))
            GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Top-k document-frequency vocabulary (distinct per doc, then group),
    * ranked (doc_freq DESC, t) — a total order, so any k-cut is
    * deterministic. ONE definition (with [[vocabSql]]) shared by
    * vocab_topk and vocab_coverage: a tokenization or tie-break edit in
    * one key would otherwise silently desynchronize the coverage profile
    * from the vocabulary it claims to evaluate. */
  private[llm] def vocabOf(docs: DataFrame, k: Int): DataFrame =
    docs
      // relational filter after explode (codegen) rather than the
      // interpreted filter() lambda inside the array
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("t"))
      .filter(col("t") =!= "")
      .distinct()
      .groupBy("t")
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("t"))
      .limit(k)

  /** DuckDB twin of [[vocabOf]]. */
  private def vocabSql(k: Int): String =
    s"""SELECT t, count(*) AS doc_freq
        FROM (SELECT DISTINCT doc_id,
                UNNEST(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS t
              FROM documents)
        GROUP BY t ORDER BY doc_freq DESC, t LIMIT $k"""

  /** Corpus vocabulary: top-50 tokens by document frequency — the df
    * side of tf-idf and the stopword-list bootstrap for corpus-specific
    * quality filters. */
  val vocabTopk = QuerySpec(
    "vocab_topk",
    (s, d) => vocabOf(documents(s, d), 50),
    Some(vocabSql(50))
  )

  /** Tokenizer-vocabulary coverage: per-document whitespace-token count,
    * in-vocabulary token count (with multiplicity) and OOV milli-rate
    * against the corpus top-10 document-frequency vocabulary (exactly
    * vocab_topk's ranking: doc_freq DESC, token ASC — a total order, so
    * the cut is deterministic; k=10 < the fixture corpus's distinct-word
    * count, so the OOV profile is non-degenerate). The coverage/OOV
    * profile is how a tokenizer-vocab candidate is evaluated against a
    * pretraining corpus before committing to the expensive BPE train
    * (bpe_merge_pairs).
    *
    * Scale shape: the vocab is config-sized (k rows after the limit) —
    * its broadcast is the sanctioned kind — so coverage is one explode +
    * broadcast left-join + per-doc hash aggregate: embarrassingly
    * parallel, no corpus-sized shuffle beyond the per-doc agg itself. */
  val vocabCoverage = QuerySpec(
    "vocab_coverage",
    (s, d) => {
      val docs = documents(s, d)
      val vocab = vocabOf(docs, 10).select(col("t"), lit(1L).as("iv"))
      // explode_OUTER keeps a token-free document as one null-token row
      // (count(t) = 0), so every doc stays in the profile WITHOUT an
      // outer join-back against the corpus-sized per-doc aggregate —
      // which the static planner would otherwise broadcast at bench
      // scale, the exact corpus-derived-broadcast shape the repo bans
      docs
        .select(col("doc_id"), explode_outer(tokens).as("t"))
        .join(broadcast(vocab), Seq("t"), "left")
        .groupBy("doc_id")
        .agg(count(col("t")).as("n_tokens"),
          coalesce(sum(col("iv")), lit(0L)).as("in_vocab"))
        .withColumn("oov_milli",
          expr("(1000 * (n_tokens - in_vocab)) div greatest(n_tokens, 1)"))
        .orderBy("doc_id")
    },
    Some(s"""WITH vocab AS (
              SELECT t FROM (${vocabSql(10)})),
            tok AS (
              SELECT doc_id,
                     UNNEST(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS t
              FROM documents),
            agg AS (
              SELECT tok.doc_id, count(*) AS n_tokens,
                     CAST(COALESCE(SUM(CASE WHEN v.t IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS in_vocab
              FROM tok LEFT JOIN vocab v ON v.t = tok.t
              GROUP BY tok.doc_id)
            SELECT d.doc_id,
                   COALESCE(a.n_tokens, 0) AS n_tokens,
                   COALESCE(a.in_vocab, 0) AS in_vocab,
                   (1000 * (COALESCE(a.n_tokens, 0) - COALESCE(a.in_vocab, 0)))
                     // greatest(COALESCE(a.n_tokens, 0), 1) AS oov_milli
            FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
            ORDER BY d.doc_id""")
  )

  /** Deterministic content-hash train/val/test split (80/10/10) — the
    * reproducible-sampling primitive every training-data pipeline needs:
    * assignment is a pure function of document CONTENT, so it survives
    * re-sharding, re-ordering, and incremental re-runs (row-position
    * sampling does not), and a salt prefix versions the split without
    * touching the data. All-integer bucket math; the oracle derives the
    * same 32-bit hash value digit-by-digit (DuckDB has no conv). */
  val sampleSplit = QuerySpec(
    "sample_split",
    (s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          expr("conv(substring(md5(concat('split-v1:', text)), 1, 8), 16, 10)")
            .cast("long").as("h"))
        .select(col("doc_id"), (col("h") % 100).as("bucket"),
          when(col("h") % 100 < 80, "train")
            .when(col("h") % 100 < 90, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id"),
    Some {
      val v = md5Hex32Sql("'split-v1:' || text")
      s"""SELECT doc_id, v % 100 AS bucket,
                 CASE WHEN v % 100 < 80 THEN 'train'
                      WHEN v % 100 < 90 THEN 'val'
                      ELSE 'test' END AS split
          FROM (SELECT doc_id, $v AS v FROM documents)
          ORDER BY doc_id"""
    }
  )

  /** PII surface detection — the filter stage a compliant training-data
    * pipeline runs before anything ships: per-document counts of email,
    * URL and long-digit-run (phone/ID-shaped) matches, plus the gate
    * flag. Patterns stay in the regex subset Java and RE2 agree on
    * (character classes + quantifiers, no backrefs/lookaround), the same
    * parity contract token_count already relies on. Detection only —
    * redaction composes as a regexp_replace projection with the same
    * patterns. */
  val piiDetect = QuerySpec(
    "pii_detect",
    (s, d) => {
      // function API, NOT expr(): a SQL string literal would be unescaped
      // by Spark's parser, silently turning the \. into "any char" while
      // DuckDB's literal keeps it — two different regexes
      val (email, url, digits) = (piiEmail, piiUrl, piiDigits)
      def cnt(p: String) =
        size(regexp_extract_all(col("text"), lit(p), lit(0))).cast("long")
      documents(s, d)
        .select(col("doc_id"),
          cnt(email).as("email_cnt"),
          cnt(url).as("url_cnt"),
          cnt(digits).as("digit_run_cnt"))
        .withColumn("pii_flag",
          (col("email_cnt") + col("url_cnt") + col("digit_run_cnt") > 0)
            .cast("long"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS email_cnt,
                   len(regexp_extract_all(text, 'https?://[^ ]+')) AS url_cnt,
                   len(regexp_extract_all(text, '[0-9]{7,}')) AS digit_run_cnt,
                   CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                        + len(regexp_extract_all(text, 'https?://[^ ]+'))
                        + len(regexp_extract_all(text, '[0-9]{7,}')) > 0 AS BIGINT) AS pii_flag
            FROM documents ORDER BY doc_id""")
  )

  /** Repetition signals (the Gopher-rules quality family): per-document
    * duplicate-token and duplicate-bigram fractions plus the
    * most-frequent-token share, all as exact integer milli-ratios. High
    * values flag boilerplate / template / degenerate-generation text.
    * Shape at scale: explode → two-level hash aggregate per doc — the
    * same embarrassingly-parallel per-document profile as quality_score,
    * no corpus-wide state. */
  val repetitionRatio = QuerySpec(
    "repetition_ratio",
    (s, d) => {
      val base = documents(s, d).select(col("doc_id"), tokens.as("toks"))
      val tc = base.select(col("doc_id"), explode(col("toks")).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      val ts = tc.groupBy("doc_id").agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct_tokens"),
        max(col("c")).as("top_cnt"))
      // adjacent-pair bigrams off the SAME filtered token list the token
      // stats use; size > 1 guard keeps sequence() ascending (Spark's
      // sequence(1, 0) is the DESCENDING [1, 0])
      val bc = base.filter(size(col("toks")) > 1)
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(1), size(col("toks")) - 1)).as("i"))
        .select(col("doc_id"),
          concat(expr("element_at(toks, i)"), lit(" "),
            expr("element_at(toks, i + 1)")).as("b"))
        .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      val bs = bc.groupBy("doc_id").agg(
        sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"))
      documents(s, d).select("doc_id")
        .join(ts, Seq("doc_id"), "left")
        .join(bs, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("n_distinct_tokens"), lit(0L)).as("n_distinct_tokens"),
          coalesce(col("top_cnt"), lit(0L)).as("top_cnt"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("n_distinct_bigrams"), lit(0L)).as("n_distinct_bigrams"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
          expr("(1000 * (n_tokens - n_distinct_tokens)) div greatest(n_tokens, 1)")
            .as("dup_token_milli"),
          expr("(1000 * top_cnt) div greatest(n_tokens, 1)")
            .as("top_token_milli"),
          col("n_bigrams"), col("n_distinct_bigrams"),
          expr("(1000 * (n_bigrams - n_distinct_bigrams)) div greatest(n_bigrams, 1)")
            .as("dup_bigram_milli"))
        .orderBy("doc_id")
    },
    Some("""WITH lst AS (
              SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), w -> w <> '') AS toks
              FROM documents),
            tc AS (
              SELECT doc_id, t, count(*) AS c
              FROM (SELECT doc_id, UNNEST(toks) AS t FROM lst)
              GROUP BY doc_id, t),
            ts AS (
              SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                     count(*) AS n_distinct_tokens,
                     CAST(MAX(c) AS BIGINT) AS top_cnt
              FROM tc GROUP BY doc_id),
            bc AS (
              SELECT doc_id, b, count(*) AS c
              FROM (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS b
                    FROM lst, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)
                    WHERE len(toks) > 1)
              GROUP BY doc_id, b),
            bs AS (
              SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
                     count(*) AS n_distinct_bigrams
              FROM bc GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(n_tokens, 0) AS n_tokens,
                   COALESCE(n_distinct_tokens, 0) AS n_distinct_tokens,
                   (1000 * (COALESCE(n_tokens, 0) - COALESCE(n_distinct_tokens, 0)))
                     // greatest(COALESCE(n_tokens, 0), 1) AS dup_token_milli,
                   (1000 * COALESCE(top_cnt, 0))
                     // greatest(COALESCE(n_tokens, 0), 1) AS top_token_milli,
                   COALESCE(n_bigrams, 0) AS n_bigrams,
                   COALESCE(n_distinct_bigrams, 0) AS n_distinct_bigrams,
                   (1000 * (COALESCE(n_bigrams, 0) - COALESCE(n_distinct_bigrams, 0)))
                     // greatest(COALESCE(n_bigrams, 0), 1) AS dup_bigram_milli
            FROM documents d
            LEFT JOIN ts ON d.doc_id = ts.doc_id
            LEFT JOIN bs ON d.doc_id = bs.doc_id
            ORDER BY d.doc_id""")
  )

  /** Stratified sampling: per-language keep rates (balance the corpus
    * mix), assignment by content hash — the same reproducibility contract
    * as sampleSplit: a document's fate is a pure function of its content
    * and the salt, independent of sharding or arrival order. Rates are
    * per-mille; the filter is a pure integer comparison. */
  val stratifiedSample = QuerySpec(
    "stratified_sample",
    (s, d) => {
      val rate = when(col("lang") === "en", 250L)
        .when(col("lang") === "de", 500L)
        .when(col("lang") === "fr", 500L)
        .when(col("lang") === "es", 750L)
        .otherwise(1000L)
      documents(s, d)
        .select(col("doc_id"), col("lang"),
          (expr("conv(substring(md5(concat('strat-v1:', text)), 1, 8), 16, 10)")
            .cast("long") % 1000).as("bucket"),
          rate.as("rate_milli"))
        .filter(col("bucket") < col("rate_milli"))
        .orderBy("doc_id")
    },
    Some {
      val v = md5Hex32Sql("'strat-v1:' || text")
      s"""SELECT doc_id, lang, v % 1000 AS bucket,
                 CASE lang WHEN 'en' THEN 250 WHEN 'de' THEN 500
                           WHEN 'fr' THEN 500 WHEN 'es' THEN 750
                           ELSE 1000 END AS rate_milli
          FROM (SELECT doc_id, lang, $v AS v FROM documents)
          WHERE v % 1000 < CASE lang WHEN 'en' THEN 250 WHEN 'de' THEN 500
                                     WHEN 'fr' THEN 500 WHEN 'es' THEN 750
                                     ELSE 1000 END
          ORDER BY doc_id"""
    }
  )

  /** Per-document top-3 characteristic tokens by tf·idf-style rarity
    * weighting: score = tf × (1/df) in integer micro units (the log-free
    * idf variant, so scoring is exact integer math — monotone in tf/df,
    * which is what the ranking needs). The document-frequency table is
    * CORPUS-DERIVED, so it is never broadcast: the tf⋈df join shuffles on
    * the token — at 100 TB that is one hash-partition of the vocabulary,
    * the same shape as the inverted-index dedup joins. */
  val tfidfTopk = QuerySpec(
    "tfidf_topk",
    (s, d) => {
      val tf = documents(s, d)
        .select(col("doc_id"), explode(tokens).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score_micro").desc, col("t"))
      tf.join(df, "t")
        .withColumn("score_micro", expr("(1000000 * tf) div df"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select("doc_id", "rank", "t", "tf", "df", "score_micro")
        .orderBy("doc_id", "rank")
    },
    Some("""WITH tf AS (
              SELECT doc_id, t, count(*) AS tf
              FROM (SELECT doc_id,
                      UNNEST(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS t
                    FROM documents)
              GROUP BY doc_id, t),
            df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
            scored AS (
              SELECT tf.doc_id, tf.t, tf.tf, df.df,
                     (1000000 * tf.tf) // df.df AS score_micro
              FROM tf JOIN df ON tf.t = df.t),
            ranked AS (
              SELECT doc_id, t, tf, df, score_micro,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY score_micro DESC, t) AS rank
              FROM scored)
            SELECT doc_id, rank, t, tf, df, score_micro
            FROM ranked WHERE rank <= 3
            ORDER BY doc_id, rank""")
  )

  /** Concat-and-chunk sequence packing (the GPT-training layout: the
    * corpus is one token stream cut into fixed-size bins): each document,
    * in doc_id order, gets its stream start position; bin id and offset
    * are pure arithmetic on that prefix sum.
    *
    * The prefix sum is computed SCALABLY — not with one global
    * unpartitioned window (a single-reducer sort at 100 TB) but with the
    * classic two-level scan: (1) per-chunk token totals, where the chunk
    * span is DERIVED from the corpus key range so the chunk count is
    * genuinely config-bounded (≤ 64k chunks at ANY corpus size — the
    * derivation is one cheap max(doc_id) scalar feedback), (2) a global
    * window over the chunk-totals table — ≤ 64k rows by construction,
    * so the single-partition sort is a fixed-size step, not a
    * corpus-proportional one, (3) join the offsets back (shuffle_hash
    * on the static plan — the offsets ride the SAME hashpartitioning
    * (chunk) the intra-chunk window needs anyway, and AQE is free to
    * demote the bounded side to a broadcast at runtime) and run the
    * intra-chunk window PARTITIONED by chunk. The oracle states the
    * same semantics as the naive single global window. */
  val sequencePack = QuerySpec(
    "sequence_pack",
    (s, d) => packOf(documents(s, d)),
    // oracle below; the plan itself is packOf (shared with ScaleProbe)
    // oracle is deliberately WINDOW-FREE: DuckDB's parallel evaluation of
    // globally-ordered windows was observed intermittently mis-summing
    // (the window_mom_delta finding, and the CORRECTNESS_r03 hash red on
    // this key that never reproduced serially) — the prefix sum is the
    // quadratic self-join form instead, trivial at oracle scale (<=5k rows)
    Some("""WITH toks AS (
              SELECT doc_id,
                     CAST(len(list_filter(string_split(lower(text), ' '),
                                          w -> w <> '')) AS BIGINT) AS n_tokens
              FROM documents),
            pos AS (
              SELECT a.doc_id, a.n_tokens,
                     CAST(COALESCE(SUM(b.n_tokens), 0) AS BIGINT) AS start_pos
              FROM toks a LEFT JOIN toks b ON b.doc_id < a.doc_id
              GROUP BY a.doc_id, a.n_tokens)
            SELECT doc_id, n_tokens, start_pos,
                   start_pos // 2048 AS bin_id,
                   start_pos % 2048 AS bin_offset
            FROM pos ORDER BY doc_id""")
  )

  /** The sequence_pack plan over an arbitrary documents frame (shared
    * with ScaleProbe's replication curve). The chunk span is derived
    * from the corpus key range targeting ≤ 64k chunks, so the offset
    * table is config-bounded at any corpus size — the output is
    * span-invariant (chunking only decomposes the prefix sum), so the
    * derivation changes nothing but the plan's scale envelope. */
  def packOf(docs: DataFrame): DataFrame = {
    val binTokens = 2048L
    // one cheap max(doc_id) scalar feedback (the A10 pattern) sizes the
    // spans; empty corpus → span 1 over zero rows
    val maxId = Option(docs.agg(max(col("doc_id"))).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val chunkSpan = packSpanFor(maxId)
    val toks = docs.select(col("doc_id"),
      size(tokens).cast("long").as("n_tokens"),
      expr(s"doc_id div $chunkSpan").as("chunk"))
    val chunkTotals = toks.groupBy("chunk")
      .agg(sum(col("n_tokens")).as("chunk_tokens"))
    val wChunks = Window.orderBy("chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunkOffsets = chunkTotals
      .withColumn("chunk_offset",
        coalesce(sum(col("chunk_tokens")).over(wChunks), lit(0L)))
      .select("chunk", "chunk_offset")
    val wInChunk = Window.partitionBy("chunk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    // shuffle_hash, not broadcast: the offsets are corpus-DERIVED (even
    // if config-BOUNDED) — the static plan keeps the
    // never-broadcast-corpus-derived rule, both sides already hash by
    // chunk (the window needs that partitioning anyway), and AQE may
    // still demote the ≤64k-row side to a broadcast at runtime
    toks.join(chunkOffsets.hint("shuffle_hash"), "chunk")
      .withColumn("start_pos", col("chunk_offset") +
        coalesce(sum(col("n_tokens")).over(wInChunk), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("start_pos"),
        expr(s"start_pos div $binTokens").as("bin_id"),
        (col("start_pos") % binTokens).as("bin_offset"))
      .orderBy("doc_id")
  }

  /** Chunk span for a key domain [0, maxKey]: ceil so the chunk count
    * never exceeds 64k. Exposed for the ScaleProbe bound printout. */
  def packSpanFor(maxKey: Long): Long = math.max(1L, maxKey / 65536L + 1L)

  /** Overlapping-window document chunking (embedding / retrieval prep):
    * 200-char windows at stride 150, so consecutive chunks share a
    * 50-char overlap and no content is lost at boundaries. Pure per-row
    * explode arithmetic — embarrassingly parallel, stays in codegen
    * (primitive int sequence + substring, no lambda), and at 100 TB the
    * chunk stream inherits the input's partitioning with zero shuffle. */
  val docChunk = QuerySpec(
    "doc_chunk",
    (s, d) =>
      documents(s, d)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1),
            greatest(length(col("text")), lit(1)), lit(150))).as("start"))
        .select(col("doc_id"),
          expr("((start - 1) div 150) + 1").cast("long").as("chunk_id"),
          col("start").cast("long").as("chunk_start"),
          expr("substring(text, start, 200)").as("chunk_text"))
        .withColumn("chunk_len", length(col("chunk_text")).cast("long"))
        .orderBy("doc_id", "chunk_id"),
    Some("""SELECT doc_id,
                   CAST((start - 1) // 150 + 1 AS BIGINT) AS chunk_id,
                   CAST(start AS BIGINT) AS chunk_start,
                   substr(text, start, 200) AS chunk_text,
                   CAST(length(substr(text, start, 200)) AS BIGINT) AS chunk_len
            FROM documents,
                 UNNEST(generate_series(1, greatest(length(text), 1), 150)) AS t(start)
            ORDER BY doc_id, chunk_id""")
  )

  /** PII redaction — the action stage behind pii_detect's gate: emails,
    * URLs and long digit runs rewritten to typed placeholder tokens.
    * Replacements apply in a FIXED order (email → url → digit-run) so
    * overlapping matches (an email inside a URL path) resolve identically
    * in both engines; the per-kind counts are surface counts on the raw
    * text (pii_detect semantics), deliberately order-independent. Same
    * per-document codegen'd shape as the rest of the family — redaction
    * adds zero shuffles over the detect pass. */
  val piiRedact = QuerySpec(
    "pii_redact",
    (s, d) => {
      // function API, NOT expr(): Spark's SQL parser would unescape the
      // string literal and change the regex (see pii_detect)
      val (email, url, digits) = (piiEmail, piiUrl, piiDigits)
      def cnt(p: String) =
        size(regexp_extract_all(col("text"), lit(p), lit(0))).cast("long")
      documents(s, d)
        .select(col("doc_id"),
          cnt(email).as("email_cnt"),
          cnt(url).as("url_cnt"),
          cnt(digits).as("digit_run_cnt"),
          regexp_replace(
            regexp_replace(
              regexp_replace(col("text"), email, "<EMAIL>"),
              url, "<URL>"),
            digits, "<NUM>").as("redacted"))
        .withColumn("redacted_len", length(col("redacted")).cast("long"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS email_cnt,
                   len(regexp_extract_all(text, 'https?://[^ ]+')) AS url_cnt,
                   len(regexp_extract_all(text, '[0-9]{7,}')) AS digit_run_cnt,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       'https?://[^ ]+', '<URL>', 'g'),
                     '[0-9]{7,}', '<NUM>', 'g') AS redacted,
                   CAST(length(regexp_replace(
                     regexp_replace(
                       regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       'https?://[^ ]+', '<URL>', 'g'),
                     '[0-9]{7,}', '<NUM>', 'g')) AS BIGINT) AS redacted_len
            FROM documents ORDER BY doc_id""")
  )

  /** Canonical text normalization — the first map stage of every dedup /
    * quality pipeline: lowercase, collapse whitespace runs to single
    * spaces, trim. The whitespace class is spelled explicitly
    * (`[ \t\n\r\f]`) because Java's `\s` includes vertical tab while
    * RE2's does not — the one-char divergence that would silently fork
    * the engines. Emits the md5 of the normalized form so the gate
    * checks the full content without shipping it twice. */
  val textNormalize = QuerySpec(
    "text_normalize",
    (s, d) =>
      documents(s, d)
        .select(col("doc_id"), length(col("text")).cast("long").as("raw_len"),
          trim(regexp_replace(lower(col("text")), "[ \\t\\n\\r\\f]+", " "))
            .as("norm"))
        .select(col("doc_id"), col("raw_len"),
          length(col("norm")).cast("long").as("norm_len"),
          md5(col("norm")).as("norm_md5"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, CAST(length(text) AS BIGINT) AS raw_len,
                   CAST(length(norm) AS BIGINT) AS norm_len,
                   md5(norm) AS norm_md5
            FROM (SELECT doc_id, text,
                         trim(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g')) AS norm
                  FROM documents)
            ORDER BY doc_id""")
  )

  /** Character-trigram familiarity: the mean corpus frequency of a
    * document's trigram occurrences — the integer-exact stand-in for a
    * character-LM perplexity filter (LOW familiarity = text unlike the
    * corpus: wrong language, encoding garbage, machine noise). The
    * corpus model is just the trigram count table; scoring is one
    * shuffle join on the trigram string + a per-doc average. The count
    * table is corpus-derived and therefore NEVER broadcast (the
    * ngram_jaccard lesson); at 100 TB it gets bucketed by trigram and
    * reused across scoring runs. */
  val trigramFamiliarity = QuerySpec(
    "trigram_familiarity",
    (s, d) => {
      val tri = shingleRows(documents(s, d), 3)
      val counts = tri.groupBy("s").agg(count(lit(1)).as("c"))
      tri.join(counts, "s")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_trigrams"),
          expr("sum(c) div count(1)").as("familiarity"))
        .orderBy("doc_id")
    },
    Some("""WITH tri AS (
              SELECT doc_id, substr(text, i, 3) AS s
              FROM documents,
                   UNNEST(generate_series(1, greatest(length(text)-2, 1))) AS t(i)),
            counts AS (SELECT s, count(*) AS c FROM tri GROUP BY s)
            SELECT doc_id, count(*) AS n_trigrams,
                   CAST(CAST(SUM(c) AS BIGINT) // count(*) AS BIGINT) AS familiarity
            FROM tri JOIN counts USING (s)
            GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Source-mix profile: per-origin document counts and volume, where a
    * document's origin is the DOMAIN of its first URL when it carries
    * one (lowercased host, scheme/port/path stripped) and its `source`
    * tag otherwise — the report a crawl-derived corpus runs before
    * weighting or filtering by origin. The URL branch is gated on an
    * explicit rlike/regexp_matches test (DuckDB's and Java's no-match
    * return values differ; a boolean gate sidesteps both), and the host
    * extraction is a capture-group-free two-step in the Java∩RE2 regex
    * subset. Shape: per-doc projection + one count shuffle keyed by
    * origin. */
  val sourceMix = QuerySpec(
    "source_mix",
    (s, d) => {
      val url = "https?://[^ ]+"
      val firstUrl = regexp_extract(col("text"), url, 0)
      val domain = regexp_replace(
        lower(regexp_replace(firstUrl, "^https?://", "")), "[/:?#].*$", "")
      documents(s, d)
        .select(
          when(col("text").rlike(url), domain)
            .otherwise(col("source")).as("origin"),
          length(col("text")).cast("long").as("n"))
        .groupBy("origin")
        .agg(count(lit(1)).as("doc_cnt"),
          sum(col("n")).as("total_chars"),
          expr("sum(n) div count(1)").as("mean_chars"))
        .orderBy("origin")
    },
    Some("""SELECT origin, count(*) AS doc_cnt,
                   CAST(SUM(n) AS BIGINT) AS total_chars,
                   CAST(CAST(SUM(n) AS BIGINT) // count(*) AS BIGINT) AS mean_chars
            FROM (SELECT CASE WHEN regexp_matches(text, 'https?://[^ ]+')
                              THEN regexp_replace(
                                     lower(regexp_replace(
                                       regexp_extract(text, 'https?://[^ ]+'),
                                       '^https?://', '')),
                                     '[/:?#].*$', '')
                              ELSE source END AS origin,
                         CAST(length(text) AS BIGINT) AS n
                  FROM documents)
            GROUP BY origin ORDER BY origin NULLS FIRST""")
  )

  /** Robust winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
    * 2003 — the MOSS algorithm): per document, hash every 8-char gram,
    * slide a window of 4 consecutive gram hashes, and keep each
    * window's minimum (rightmost on ties). The selected (position,
    * hash) set is the standard LOCAL fingerprint for partial-overlap /
    * containment detection — unlike whole-doc hashing (doc_fingerprint)
    * or set-similarity signatures (minhash), matching fingerprints
    * localize WHERE two documents share a passage, with the winnowing
    * guarantee that any shared run of ≥ 11 chars (k+w−1) yields at
    * least one common fingerprint.
    *
    * Cross-engine exactness: the argmin-with-rightmost-tie is encoded
    * arithmetically — key = (v+1)·2²⁰ − pos, so MIN(key) picks smallest
    * v then largest pos, and (v, pos) decode by floor division on a
    * strictly positive key (no negative div, where Spark truncates but
    * DuckDB floors). The 2²⁰ position base bounds docs at 1M chars
    * here; at larger docs raise the base and drop the hash to 28 bits
    * so (v+1)·base stays inside a long.
    *
    * Scale shape: gram explode + hash is map-side; ONE shuffle on
    * doc_id feeds the partitioned ROWS-frame window (never global);
    * the distinct on (doc_id, key) re-uses the same key's partitioning.
    * At 100 TB fingerprints are the join key for cross-corpus overlap —
    * bucketed by hash, the overlap probe is a co-located equi-join. */
  /** The winnowing core over any (doc_id, text) frame — shared by the
    * query key and the guarantee tests. */
  def winnowFingerprints(docs: DataFrame): DataFrame = {
    val C = 1L << 20
    val grams = docs
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"), col("text"),
        (length(col("text")) - 7L).cast("long").as("n"),
        explode(sequence(lit(1), length(col("text")) - lit(7))).as("pos"))
      .select(col("doc_id"), col("n"), col("pos").cast("long").as("pos"),
        expr("cast(conv(substring(md5(substring(text, pos, 8)), 1, 8), 16, 10) as bigint)")
          .as("v"))
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(0, 3)
    grams
      .withColumn("k", min((col("v") + 1L) * C - col("pos")).over(win))
      // winnowing is defined on FULL windows: starts past n-w+1 see a
      // truncated frame and must not pick
      .filter(col("pos") <= col("n") - 3L)
      .select(col("doc_id"), col("k")).distinct()
      .select(col("doc_id"),
        (expr(s"k div ${C}L") + 1L) * C - col("k") as "pos",
        expr(s"k div ${C}L").as("fp_hash"))
    // NO trailing global sort: the one consumer that needs doc order
    // (the winnow_fingerprint key) sorts after the stage's parquet
    // round-trip anyway (parquet doesn't guarantee order), and the
    // pairing path starts with a distinct — a sort here would bill a
    // corpus-sized range exchange to every stage build for nothing
  }

  /** The winnowing fingerprint table as a materialized pipeline stage —
    * consumed by the fingerprint listing AND the shared-passage pairing
    * (the copurchase_edges pattern): in a Verify/Bench run both keys
    * read ONE parquet artifact instead of re-exploding the corpus per
    * key, and the re-read has real statistics for the planner. */
  private def winnowFpStage(s: SparkSession, d: String): DataFrame =
    graft.Materialize.once(s, s"winnow_fp|$d")(
      winnowFingerprints(documents(s, d)))

  val winnowFingerprint = QuerySpec(
    "winnow_fingerprint",
    (s, d) => winnowFpStage(s, d).orderBy("doc_id", "pos"),
    // window-free oracle (DuckDB parallel-window flake guard): each
    // window start band-joins its 4 grams and MIN-picks the encoded key;
    // hash = the same per-hex-digit md5 decode the simhash oracle uses
    Some(
      s"""WITH $winnowPickCteSql,
          fp AS (SELECT DISTINCT doc_id, k FROM pick)
          SELECT doc_id,
                 (k // 1048576 + 1) * 1048576 - k AS pos,
                 k // 1048576 AS fp_hash
          FROM fp ORDER BY doc_id, pos""")
  )

  /** Bigram collocations by pointwise-mutual-information LIFT — the
    * phrase-mining pass that finds multiword units ("new york") before
    * tokenizer/vocab training. lift = p(x,y)/(p(x)·p(y)) =
    * c_xy·N²/(M·c_x·c_y), emitted as exact integer millis (the log is
    * monotone, so ranking by lift IS ranking by PMI — no transcendental
    * function ever runs, because libm rounding differs between engines).
    * DECIMAL(38,0)/HUGEINT intermediates keep c_xy·N²·1000 exact to
    * ~10¹¹-token corpora (vs ~10⁵ for a naive long); past that, rescale
    * N on both sides before the ratio.
    *
    * Scale shape: bigram extraction is a per-row array HOF (consecutive
    * token pairs — no self-join); counts are two map-side-combinable
    * group-bys; the unigram joins key on single words (corpus-derived →
    * shuffle, never broadcast); the two scalar totals ride a single-row
    * crossJoin broadcast. */
  val collocationPmi = QuerySpec(
    "collocation_pmi",
    (s, d) => {
      val toks = documents(s, d)
        .select(col("doc_id"), split(lower(col("text")), " ").as("l"))
      val uni = toks
        .select(explode(col("l")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("c"))
      val bi = toks
        // ANSI guard: size≥2 BEFORE sequence — Spark's sequence(1, 0)
        // counts DOWN ([1,0]) and l[1] on a 1-token doc would throw
        // under ANSI; with the filter every index is in bounds
        .filter(size(col("l")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(l) - 1), i -> struct(l[i-1] AS w1, l[i] AS w2))"))
          .as("p"))
        .select(col("p.w1"), col("p.w2"))
        .filter(col("w1") =!= "" && col("w2") =!= "")
        .groupBy("w1", "w2").agg(count(lit(1)).as("cxy"))
      val n = uni.agg(sum(col("c")).as("n"))
      val m = bi.agg(sum(col("cxy")).as("m"))
      bi.filter(col("cxy") >= 5)
        // unigram counts are vocabulary-sized (corpus-derived) — the
        // static plan must shuffle-hash them, never broadcast
        .join(uni.select(col("w").as("w1"), col("c").as("c1"))
          .hint("shuffle_hash"), "w1")
        .join(uni.select(col("w").as("w2"), col("c").as("c2"))
          .hint("shuffle_hash"), "w2")
        .crossJoin(broadcast(n)).crossJoin(broadcast(m))
        // div (IntegralDivide), NOT decimal `/` + cast: decimal division
        // rounds at its result scale before any cast, which can round UP
        // across the integer boundary where DuckDB's // floors
        .select(col("w1"), col("w2"), col("cxy"),
          expr("""(cast(cxy AS DECIMAL(38,0)) * n * n * 1000)
                  div (cast(m AS DECIMAL(38,0)) * c1 * c2)""").as("lift_milli"))
        .orderBy(col("lift_milli").desc, col("w1"), col("w2"))
        .limit(40)
    },
    // DuckDB's DECIMAL division semantics differ from Spark's at scale
    // 38 — both sides therefore do the division on HUGEINT/decimal and
    // FLOOR via integer semantics: Spark decimal-div then cast(long)
    // truncates toward zero on positives; DuckDB // floors. All values
    // positive → identical.
    Some("""WITH toks AS (
              SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents),
            uni AS (
              SELECT u AS w, count(*) AS c
              FROM (SELECT UNNEST(l) AS u FROM toks) WHERE u <> '' GROUP BY 1),
            nn AS (SELECT CAST(sum(c) AS HUGEINT) AS n FROM uni),
            bi AS (
              SELECT l[i] AS w1, l[i+1] AS w2, count(*) AS cxy
              FROM toks,
                   UNNEST(generate_series(1, CAST(len(l) - 1 AS INTEGER))) AS t(i)
              WHERE l[i] <> '' AND l[i+1] <> ''
              GROUP BY 1, 2),
            mm AS (SELECT CAST(sum(cxy) AS HUGEINT) AS m FROM bi)
            SELECT w1, w2, cxy,
                   CAST((CAST(cxy AS HUGEINT) * n * n * 1000) // (m * c1.c * c2.c) AS BIGINT) AS lift_milli
            FROM bi
            JOIN uni c1 ON c1.w = w1
            JOIN uni c2 ON c2.w = w2, nn, mm
            WHERE cxy >= 5
            ORDER BY lift_milli DESC, w1, w2 LIMIT 40""")
  )

  /** Group-aware (leakage-safe) split: every document of one SOURCE
    * lands in the same train/val/test bucket, so near-duplicate pages
    * from one site can never straddle the train/eval boundary — the
    * group-level cousin of sample_split's per-document content hash.
    * Same salted-md5 bucket arithmetic, keyed on the group column;
    * pure projection, zero shuffle, assignment survives re-sharding. */
  /** The group-aware split plan over any (doc_id, source) frame —
    * shared by the query key and the composed pipeline_quality_pack. */
  def leakageSafeSplitOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        expr("conv(substring(md5(concat('grp-v1:', source)), 1, 8), 16, 10)")
          .cast("long").as("h"))
      .select(col("doc_id"), col("source"), (col("h") % 100).as("bucket"),
        when(col("h") % 100 < 80, "train")
          .when(col("h") % 100 < 90, "val")
          .otherwise("test").as("split"))

  val leakageSafeSplit = QuerySpec(
    "leakage_safe_split",
    (s, d) => leakageSafeSplitOf(documents(s, d)).orderBy("doc_id"),
    Some {
      val v = md5Hex32Sql("'grp-v1:' || source")
      s"""SELECT doc_id, source, v % 100 AS bucket,
                 CASE WHEN v % 100 < 80 THEN 'train'
                      WHEN v % 100 < 90 THEN 'val'
                      ELSE 'test' END AS split
          FROM (SELECT doc_id, source, $v AS v FROM documents)
          ORDER BY doc_id"""
    }
  )

  /** Cross-document shared-passage detection — winnow_fingerprint's
    * payoff query: doc pairs sharing ≥5 distinct winnowing fingerprint
    * hashes, i.e. pairs with CONTIGUOUS common passages (each shared
    * hash witnesses a ≥8-char verbatim run), not just similar shingle
    * SETS (minhash) or similar hash profiles (simhash).
    *
    * The pairing is the rare-token inverted-index discipline from
    * ngram_jaccard: fingerprints appearing in >10 docs are boilerplate
    * and get dropped (df ∈ [2,10]) BEFORE the self-join, so bucket
    * sizes — and the pair fan-out — stay bounded no matter the corpus;
    * the only shuffles are the df count and the hash-keyed join. At
    * 100 TB, fingerprints bucket by hash and the probe is co-located. */
  /** The shared-passage pipeline over any (doc_id, text) frame — shared
    * by the query key (which feeds it the materialized winnow_fp stage)
    * and the ScaleProbe replication curve (arbitrary frames). */
  def sharedPassagePairsOf(docs: DataFrame): DataFrame =
    sharedPassagePairsFromFp(winnowFingerprints(docs))

  /** The pairing half over an already-computed fingerprint frame. */
  def sharedPassagePairsFromFp(fps: DataFrame): DataFrame = {
    val fp = fps
      .select(col("doc_id"), col("fp_hash")).distinct()
    val df = fp.groupBy("fp_hash").agg(count(lit(1)).as("df"))
    // rare feeds BOTH sides of the self-join: checkpoint it so the
    // winnowing (gram explode + window + distinct) runs once, not
    // twice; df is corpus-derived → shuffle_hash, never broadcast
    val rare = fp.join(df.filter(col("df").between(2, 10))
        .hint("shuffle_hash"), "fp_hash")
      .select("doc_id", "fp_hash")
      .localCheckpoint(false)
    rare.select(col("doc_id").as("id1"), col("fp_hash"))
      .join(rare.select(col("doc_id").as("id2"), col("fp_hash"))
        .hint("shuffle_hash"), "fp_hash")
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2")
      .agg(count(lit(1)).as("shared_cnt"))
      .filter(col("shared_cnt") >= 5)
  }

  val sharedPassagePairs = QuerySpec(
    "shared_passage_pairs",
    (s, d) => sharedPassagePairsFromFp(winnowFpStage(s, d))
      .orderBy("id1", "id2"),
    Some(
      s"""WITH $winnowPickCteSql,
          fp AS (SELECT DISTINCT doc_id, k // 1048576 AS h FROM pick),
          df AS (SELECT h, count(*) AS d FROM fp GROUP BY h),
          rare AS (
            SELECT fp.doc_id, fp.h FROM fp JOIN df USING (h)
            WHERE d BETWEEN 2 AND 10)
          SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS shared_cnt
          FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id
          GROUP BY 1, 2
          HAVING count(*) >= 5
          ORDER BY id1, id2""")
  )

  /** The end-to-end corpus-cleaning recipe AS ONE PLAN — the production
    * composition every training-data pipeline actually runs, here a
    * single declarative dataflow Catalyst optimizes as a whole:
    *   1. language gate — lang_id's argmax says English;
    *   2. quality floors (Gopher-style) — ≥20 tokens, stopword ratio
    *      ≥ 10‰, alphabetic ratio ≥ 600‰ (integer milli-ratios);
    *   3. PII gate — zero email/URL/long-digit-run matches;
    *   4. exact-dedup canonicalization — smallest doc_id per md5(text).
    * Gates 1-3 are pure per-row projections that fuse into ONE codegen
    * stage over ONE scan; only the dedup canon adds a shuffle (md5
    * group) + semi join. Composing the recipe declaratively (instead of
    * materializing after each gate, as script pipelines do) is the
    * 100 TB win: one pass, no intermediate corpus copies. */
  /** The base/canon/cleaned CTE block matching [[corpusCleanOf]],
    * shared verbatim by the corpus_clean and pipeline_quality_pack
    * oracles. */
  private def corpusCleanCteSql: String =
    """base AS (
              SELECT doc_id, text,
                     len(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS n_tokens,
                     len(list_filter(string_split(lower(text), ' '),
                         w -> w IN ('the','and','of','is','a','to','in'))) AS stop_cnt,
                     length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_cnt,
                     len(list_filter(string_split(lower(text), ' '),
                         w -> w IN ('the','and','of','is'))) AS cnt_en,
                     len(list_filter(string_split(lower(text), ' '),
                         w -> w IN ('der','und','das','ist'))) AS cnt_de,
                     len(list_filter(string_split(lower(text), ' '),
                         w -> w IN ('le','et','les','une'))) AS cnt_fr,
                     len(list_filter(string_split(lower(text), ' '),
                         w -> w IN ('el','los','que','para'))) AS cnt_es,
                     len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                     + len(regexp_extract_all(text, 'https?://[^ ]+'))
                     + len(regexp_extract_all(text, '[0-9]{7,}')) AS pii_cnt
              FROM documents),
            canon AS (
              SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
            cleaned AS (
              SELECT doc_id, n_tokens,
                     (1000 * stop_cnt) // greatest(n_tokens, 1) AS stop_milli,
                     (1000 * alpha_cnt) // greatest(length(text), 1) AS alpha_milli
              FROM base SEMI JOIN canon USING (doc_id)
              WHERE cnt_en = greatest(cnt_en, cnt_de, cnt_fr, cnt_es)
                AND greatest(cnt_en, cnt_de, cnt_fr, cnt_es) > 0
                AND n_tokens >= 20
                AND (1000 * stop_cnt) // greatest(n_tokens, 1) >= 10
                AND (1000 * alpha_cnt) // greatest(length(text), 1) >= 600
                AND pii_cnt = 0)"""

  /** The corpus-clean plan over any (doc_id, text) frame — shared by
    * the query key and the composed pipeline_quality_pack. */
  def corpusCleanOf(docs: DataFrame): DataFrame = {
    val withCounts = withLangCounts(docs)
    val best = greatest(langs.map { case (l, _) => col(s"cnt_$l") }: _*)
    // en leads the precedence order, so cnt_en == best ⇔ pred = 'en'
    val isEn = col("cnt_en") === best && best > 0
    val (email, url, digits) = (piiEmail, piiUrl, piiDigits)
    def piiCnt(p: String) =
      size(regexp_extract_all(col("text"), lit(p), lit(0))).cast("long")
    val gated = withCounts
      .withColumn("n_tokens", size(tokens).cast("long"))
      .withColumn("stop_cnt",
        expr(stopCount(Seq("the", "and", "of", "is", "a", "to", "in")))
          .cast("long"))
      .withColumn("alpha_cnt",
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long"))
      .withColumn("stop_milli",
        expr("(1000 * stop_cnt) div greatest(n_tokens, 1)"))
      .withColumn("alpha_milli",
        expr("(1000 * alpha_cnt) div greatest(length(text), 1)"))
      .filter(isEn &&
        col("n_tokens") >= 20 && col("stop_milli") >= 10 &&
        col("alpha_milli") >= 600 &&
        piiCnt(email) + piiCnt(url) + piiCnt(digits) === 0)
    val canon = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    gated.join(canon, Seq("doc_id"), "left_semi")
      .select("doc_id", "n_tokens", "stop_milli", "alpha_milli")
  }

  val corpusClean = QuerySpec(
    "corpus_clean",
    (s, d) => corpusCleanOf(documents(s, d)).orderBy("doc_id"),
    Some(s"""WITH $corpusCleanCteSql
            SELECT doc_id, n_tokens, stop_milli, alpha_milli
            FROM cleaned ORDER BY doc_id""")
  )

  /** Deterministic weighted source interleaving — the data-MIXING
    * scheduler that turns per-source weights into one reproducible
    * training order: within each source, docs shuffle by content hash
    * (reproducible, re-shard-proof — the sample_split argument); each
    * doc's emit priority is rank_in_source·10⁶ div weight_milli, so a
    * weight-1000 source emits twice as often as a weight-500 one (the
    * classic deficit/virtual-time scheduler, all integer); the global
    * order over (priority, source, doc_id) IS the schedule. Weights
    * hash off the source name (stand-in for a config table — works for
    * ANY source string, no ANSI cast hazard).
    *
    * Scale: per-source ranks ride partitioned windows, and the GLOBAL
    * schedule position is two-level (the sequence_pack scan, NOT a
    * row_number over an unpartitioned window — that plans
    * Exchange SinglePartition and funnels every document through one
    * task): chunk = virtual-time band whose WIDTH is derived from the
    * corpus (one cheap max-source-size scalar feedback) so the chunk
    * count is ≤ 64k at any corpus size, per-chunk counts take a global
    * window over that config-bounded table, offsets join back
    * shuffle_hash (the chunk partitioning is needed by the local-rank
    * window anyway; AQE may demote the bounded side to a broadcast at
    * runtime), local rank is chunk-partitioned. */
  val sourceInterleave = QuerySpec(
    "source_interleave",
    (s, d) => interleaveOf(documents(s, d)),
    // window-free oracle (flake rule): both ranks are strict-predecessor
    // counts over self-joins — source-bounded for rank_in_source,
    // all-pairs (oracle-scale) for the schedule position
    Some {
      val h = md5Hex32Sql("'mix-v1:' || text")
      val w = s"500 + (${md5Hex32Sql("'w-v1:' || source")}) % 3 * 250"
      s"""WITH r AS (
            SELECT doc_id, source, CAST($h AS BIGINT) AS h,
                   CAST($w AS BIGINT) AS weight_milli
            FROM documents),
          rk AS (
            SELECT a.doc_id, a.source, a.weight_milli,
                   CAST(1 + COUNT(CASE WHEN b.h < a.h
                                         OR (b.h = a.h AND b.doc_id < a.doc_id)
                                       THEN 1 END) AS BIGINT) AS rank_in_source
            FROM r a JOIN r b ON b.source = a.source
            GROUP BY a.doc_id, a.source, a.weight_milli, a.h),
          pr AS (
            SELECT doc_id, source, weight_milli, rank_in_source,
                   (rank_in_source * 1000000) // weight_milli AS priority
            FROM rk)
          SELECT CAST(1 + COUNT(CASE WHEN b.priority < a.priority
                   OR (b.priority = a.priority AND b.source < a.source)
                   OR (b.priority = a.priority AND b.source = a.source
                       AND b.doc_id < a.doc_id) THEN 1 END) AS BIGINT) AS pos,
                 a.doc_id, a.source, a.weight_milli, a.rank_in_source,
                 CAST(a.priority AS BIGINT) AS priority
          FROM pr a CROSS JOIN pr b
          GROUP BY a.doc_id, a.source, a.weight_milli, a.rank_in_source, a.priority
          ORDER BY pos"""
    }
  )

  /** Virtual-time band width for the interleave schedule: the largest
    * per-source row count bounds the max priority at
    * maxCnt·10⁶/500 (weight floor 500 milli), and the band divides that
    * range into ≤ 64k chunks. Exposed for the ScaleProbe bound
    * printout. */
  def interleaveBandFor(maxSourceCnt: Long): Long =
    math.max(1L, (maxSourceCnt * 2000L) / 65536L + 1L)

  /** Chunk count the derived band yields (2000 = 10⁶ priority scale /
    * the 500-milli weight floor — the single place that constant lives
    * besides interleaveBandFor). Exposed for the ScaleProbe bound
    * printout so the probe can't desynchronize from the shipped
    * derivation. */
  def interleaveChunkBoundFor(maxSourceCnt: Long): Long =
    maxSourceCnt * 2000L / interleaveBandFor(maxSourceCnt) + 1

  /** The band-sizing aggregate (the A10 scalar-feedback pattern): the
    * largest per-source row count; 0 on an empty corpus. */
  def maxSourceCount(docs: DataFrame): Long =
    Option(docs.groupBy("source").agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)

  /** The source_interleave plan over an arbitrary (doc_id, source, text)
    * frame (shared with ScaleProbe's replication curve). Band width is
    * corpus-derived so the chunk-offset table stays config-bounded; the
    * schedule itself is band-invariant (banding only decomposes the
    * global rank). */
  def interleaveOf(docs: DataFrame): DataFrame =
    interleaveWith(docs, interleaveBandFor(maxSourceCount(docs)))

  /** interleaveOf with the band precomputed (ScaleProbe times this so
    * the sizing aggregate stays out of the measured plan). */
  def interleaveWith(docs: DataFrame, band: Long): DataFrame = {
    val bySrc = Window.partitionBy("source").orderBy("h", "doc_id")
    val prio = docs
      .select(col("doc_id"), col("source"),
        expr("cast(conv(substring(md5(concat('mix-v1:', text)), 1, 8), 16, 10) as bigint)")
          .as("h"),
        (lit(500L) +
          expr("cast(conv(substring(md5(concat('w-v1:', source)), 1, 8), 16, 10) as bigint) % 3")
            * 250L).as("weight_milli"))
      .withColumn("rank_in_source", row_number().over(bySrc).cast("long"))
      .withColumn("priority",
        expr("(rank_in_source * 1000000) div weight_milli"))
      .withColumn("chunk", expr(s"priority div $band"))
    val chunkOffsets = prio.groupBy("chunk")
      .agg(count(lit(1)).as("n"))
      .withColumn("chunk_offset",
        coalesce(sum(col("n")).over(Window.orderBy("chunk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("chunk", "chunk_offset")
    val inChunk = Window.partitionBy("chunk")
      .orderBy("priority", "source", "doc_id")
    // shuffle_hash, not broadcast: corpus-derived (if config-bounded)
    // offsets follow the same static-plan rule as packOf — see there
    prio.join(chunkOffsets.hint("shuffle_hash"), "chunk")
      .withColumn("pos",
        col("chunk_offset") + row_number().over(inChunk).cast("long"))
      .select("pos", "doc_id", "source", "weight_milli", "rank_in_source",
        "priority")
      .orderBy("pos")
  }

  /** Span-corruption pair construction (the T5/UL2 denoising objective
    * prep): per document, mask one deterministically-placed span
    * (start = doc_id·37 mod (len−20), length 10–20 by key) and emit the
    * supervised pair — corrupted input (span replaced by a sentinel)
    * and the target span. Deterministic span placement is a feature,
    * not a shortcut: reproducible pretraining data requires the mask to
    * be a pure function of (doc, version), same as sample_split's
    * content-hash buckets. Pure per-row string surgery — zero shuffle,
    * whole-stage codegen end to end; the corrupted text is emitted as
    * its md5 so the gate hashes the construction without shipping
    * near-duplicate corpora through the compare. */
  val spanCorruption = QuerySpec(
    "span_corruption",
    (s, d) =>
      documents(s, d)
        .filter(length(col("text")) >= 40)
        .select(col("doc_id"), col("text"),
          expr("(doc_id * 37) % (length(text) - 20) + 1").cast("long")
            .as("span_start"),
          expr("10 + doc_id % 11").cast("long").as("span_len"))
        .select(col("doc_id"), col("span_start"), col("span_len"),
          expr("substring(text, span_start, span_len)").as("target_text"),
          md5(expr(
            """concat(substring(text, 1, span_start - 1), '<extra_id_0>',
                      substring(text, span_start + span_len))"""))
            .as("input_md5"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   CAST((doc_id * 37) % (length(text) - 20) + 1 AS BIGINT) AS span_start,
                   CAST(10 + doc_id % 11 AS BIGINT) AS span_len,
                   substr(text, CAST((doc_id * 37) % (length(text) - 20) + 1 AS INTEGER),
                          CAST(10 + doc_id % 11 AS INTEGER)) AS target_text,
                   md5(substr(text, 1, CAST((doc_id * 37) % (length(text) - 20) AS INTEGER))
                       || '<extra_id_0>'
                       || substr(text, CAST((doc_id * 37) % (length(text) - 20) + 1
                                            + 10 + doc_id % 11 AS INTEGER))) AS input_md5
            FROM documents WHERE length(text) >= 40
            ORDER BY doc_id""")
  )

  /** BPE merge-pair counting over an arbitrary documents frame — the
    * tokenizer-training inner loop, shared with the spec fixtures.
    * Returns up to `k` rounds of (round, left_sym, right_sym,
    * merged_sym, pair_cnt); stops early when no adjacent pair remains.
    *
    * The loop runs over the WORD-FREQUENCY table, exactly like real BPE
    * trainers: the corpus is scanned ONCE to count words (alphabetic
    * tokens only, so the `,` symbol delimiter can never occur inside a
    * symbol), and every round after that touches only the vocab-sized
    * (word, freq) table — at 100 TB of text the distinct-word table is
    * ~10⁷ rows, so each round is one small (l, r) shuffle + a
    * TakeOrderedAndProject argmax + a per-row codegen string replace,
    * checkpointed so the lineage stays flat (the kmeans_lloyd /
    * pagerank fixed-iteration pattern).
    *
    * Symbol encoding: `,,a,,b,,c,,` — every boundary is a DOUBLE comma;
    * the merge rewrites `,l,,r,` → `,lr,`, consuming one comma from
    * each side. That makes plain left-to-right non-overlapping
    * `replace` (same semantics in Spark and DuckDB) implement exactly
    * the greedy BPE merge: chained pairs re-match (aaaa → aa,aa — the
    * replacement restores the boundary the next match needs) while a
    * symbol's interior can never false-match (a pattern needs `,l,,`,
    * and interiors have no commas). The merged symbol's single-comma
    * boundaries regain their double form in the output string, so the
    * invariant holds round over round. */
  def bpeMergesOf(docs: DataFrame, k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    var words = docs
      .select(explode(tokens).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        concat(lit(",,"), regexp_replace(col("w"), "(.)", "$1,,")).as("enc"))
      .localCheckpoint(false)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var done = false
    for (rnd <- 1 to k if !done) {
      val best = words
        .withColumn("syms", expr("filter(split(enc, ',,'), x -> x != '')"))
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS l, syms[i + 1] AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        // the argmax pair is the sanctioned scalar feedback (A10): two
        // [a-z]+ symbols — safe to splice into the replace literal
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((rnd.toLong, l, r, l + r, cnt))
        words = words
          .select(col("freq"),
            expr(s"replace(enc, ',$l,,$r,', ',$l$r,')").as("enc"))
          .localCheckpoint(false)
      }
    }
    out.toSeq.toDF("round", "left_sym", "right_sym", "merged_sym", "pair_cnt")
      .orderBy("round")
  }

  /** Tokenizer-vocabulary construction (the missing classic pretraining
    * stage after dedup→clean→mix→pack→corrupt): 3 rounds of the BPE
    * inner loop — corpus-wide adjacent-symbol-pair counts, arg-max pair
    * (ties by (l, r)), greedy merge applied everywhere, repeat. The
    * oracle unrolls the identical 3 rounds in SQL over the same
    * double-comma encoding, so both engines agree on every merge
    * decision AND its weighted pair count. */
  val bpeMergePairs = QuerySpec(
    "bpe_merge_pairs",
    (s, d) => bpeMergesOf(documents(s, d), 3),
    Some {
      def pairs(e: String) =
        s"""SELECT l, r, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
              SELECT freq, syms[i] AS l, syms[i + 1] AS r
              FROM (SELECT freq,
                      list_filter(string_split(enc, ',,'), x -> x <> '') AS syms
                    FROM $e) t,
                   UNNEST(generate_series(1, len(syms) - 1)) AS u(i))
            GROUP BY l, r"""
      def merge(e: String, b: String) =
        s"""SELECT freq,
              replace(enc, ',' || $b.l || ',,' || $b.r || ',',
                           ',' || $b.l || $b.r || ',') AS enc
            FROM $e CROSS JOIN $b"""
      s"""WITH words AS (
            SELECT w, count(*) AS freq FROM (
              SELECT UNNEST(list_filter(string_split(lower(text), ' '),
                                        x -> x <> '')) AS w
              FROM documents) t
            WHERE regexp_matches(w, '^[a-z]+${"$"}')
            GROUP BY w),
          e0 AS (
            SELECT freq,
                   ',,' || regexp_replace(w, '(.)', '\\1,,', 'g') AS enc
            FROM words),
          p1 AS (${pairs("e0")}),
          b1 AS (SELECT l, r, cnt FROM p1 ORDER BY cnt DESC, l, r LIMIT 1),
          e1 AS (${merge("e0", "b1")}),
          p2 AS (${pairs("e1")}),
          b2 AS (SELECT l, r, cnt FROM p2 ORDER BY cnt DESC, l, r LIMIT 1),
          e2 AS (${merge("e1", "b2")}),
          p3 AS (${pairs("e2")}),
          b3 AS (SELECT l, r, cnt FROM p3 ORDER BY cnt DESC, l, r LIMIT 1)
          SELECT CAST(1 AS BIGINT) AS round, l AS left_sym, r AS right_sym,
                 l || r AS merged_sym, cnt AS pair_cnt FROM b1
          UNION ALL
          SELECT CAST(2 AS BIGINT), l, r, l || r, cnt FROM b2
          UNION ALL
          SELECT CAST(3 AS BIGINT), l, r, l || r, cnt FROM b3
          ORDER BY round"""
    }
  )

  /** The END-TO-END curation recipe AS ONE PLAN — the four shipped
    * stages composed declaratively over one corpus scan intent:
    *   quality_band_filter (keep each language's best two terciles)
    *   → corpus_clean (language / quality-floor / PII / exact-dedup
    *     gates) → leakage_safe_split (keep the train shard)
    *   → sequence_pack (token offsets + 2048-token bins).
    * Survivors = the INTERSECTION of the three gate stages — each
    * composed as a left-semi join of its shipped frame-level plan
    * ([[qualityBandOf]], [[corpusCleanOf]], [[leakageSafeSplitOf]]) —
    * then packed by the shipped [[packOf]]. No stage materializes an
    * intermediate corpus copy (script pipelines write one per stage;
    * at 100 TB that is 3 corpus copies of dead I/O): Catalyst plans
    * the whole chain as one dataflow, and the only actions are
    * packOf's sanctioned scalar feedback. The oracle composes the
    * SAME shared CTE blocks the component keys use, so the pipeline
    * can never drift from its stages. */
  val pipelineQualityPack = QuerySpec(
    "pipeline_quality_pack",
    (s, d) => {
      val docs = documents(s, d)
      val keepBand = qualityBandOf(docs)
        .filter(col("keep_flag") === 1).select("doc_id")
      val clean = corpusCleanOf(docs).select("doc_id")
      val train = leakageSafeSplitOf(docs)
        .filter(col("split") === "train").select("doc_id")
      // the gate lists are corpus-derived doc_id sets — shuffle_hash,
      // never a static broadcast that only fits at bench scale (the
      // pagerank rule); the three semis reuse one doc_id partitioning
      val survivors = docs
        .join(keepBand.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
        .join(clean.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
        .join(train.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
        .select("doc_id", "text")
        // EAGER checkpoint of the survivor projection: packOf reads its
        // input twice (chunk totals + offset join-back) and derives the
        // chunk span in a third action — without materialization the
        // whole gate chain (band histogram, clean gates, split hash)
        // would re-execute per use, and a LAZY checkpoint re-plans per
        // action under AQE (the dedup_clusters lesson). This is block
        // reuse of the survivor rows, not a per-stage corpus copy
        .localCheckpoint()
      packOf(survivors)
    },
    Some {
      val v = md5Hex32Sql("'grp-v1:' || source")
      s"""WITH $qualityBandCteSql,
          $corpusCleanCteSql,
          keepband AS (
            SELECT s.doc_id FROM scored s
            JOIN bands b ON b.lang = s.lang AND b.v = s.q
            WHERE b.band <= 2),
          train AS (
            SELECT doc_id FROM (SELECT doc_id, $v AS hv FROM documents)
            WHERE hv % 100 < 80),
          surv AS (
            SELECT d.doc_id, d.text FROM documents d
            SEMI JOIN keepband USING (doc_id)
            SEMI JOIN cleaned USING (doc_id)
            SEMI JOIN train USING (doc_id)),
          toks AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split(lower(text), ' '),
                                        w -> w <> '')) AS BIGINT) AS n_tokens
            FROM surv),
          pos AS (
            SELECT a.doc_id, a.n_tokens,
                   CAST(COALESCE(SUM(b.n_tokens), 0) AS BIGINT) AS start_pos
            FROM toks a LEFT JOIN toks b ON b.doc_id < a.doc_id
            GROUP BY a.doc_id, a.n_tokens)
          SELECT doc_id, n_tokens, start_pos,
                 start_pos // 2048 AS bin_id,
                 start_pos % 2048 AS bin_offset
          FROM pos ORDER BY doc_id"""
    }
  )

  val all: Seq[QuerySpec] =
    Seq(langId, qualityScore, qualityBandFilter, tokenCount, docFingerprint,
        vocabTopk, vocabCoverage,
        sampleSplit, piiDetect, piiRedact, textNormalize, repetitionRatio,
        stratifiedSample, tfidfTopk, sequencePack, docChunk,
        trigramFamiliarity, sourceMix, winnowFingerprint, collocationPmi,
        leakageSafeSplit, sharedPassagePairs, corpusClean, sourceInterleave,
        spanCorruption, bpeMergePairs, pipelineQualityPack)
}
