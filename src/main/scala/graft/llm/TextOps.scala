package graft.llm

import graft.Tables._
import graft.QuerySpec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  private def stopCount(words: Seq[String]): String = {
    val set = words.map(w => s"'$w'").mkString(", ")
    s"size(filter(split(lower(text), ' '), w -> w IN ($set)))"
  }

  private val langs: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "das", "ist"),
    "fr" -> Seq("le", "et", "les", "une"),
    "es" -> Seq("el", "los", "que", "para"))

  /** Language ID via stopword n-gram heuristic: count per-language marker
    * words, argmax with a fixed precedence order (en > de > fr > es) so
    * ties are deterministic. */
  val langId = QuerySpec(
    "lang_id",
    (s, d) => {
      val withCounts = langs.foldLeft(documents(s, d)) { case (df, (l, ws)) =>
        df.withColumn(s"cnt_$l", expr(stopCount(ws)).cast("long"))
      }
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
          expr(stopCount(Seq("the", "and", "of", "is", "a", "to", "in")))
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
    Some("""WITH base AS (
              SELECT doc_id,
                     length(text) AS n_char,
                     len(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS n_tokens,
                     len(list_filter(string_split(lower(text), ' '),
                         w -> w IN ('the','and','of','is','a','to','in'))) AS stop_cnt,
                     length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_cnt,
                     length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct_cnt
              FROM documents)
            SELECT doc_id, n_char, n_tokens, stop_cnt, alpha_cnt, punct_cnt,
                   (1000 * stop_cnt) // greatest(n_tokens, 1) AS stop_milli,
                   (1000 * alpha_cnt) // greatest(n_char, 1) AS alpha_milli,
                   (10 * alpha_cnt) // greatest(n_tokens, 1) AS wordlen_deci
            FROM base ORDER BY doc_id""")
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

  /** Corpus vocabulary: top-50 tokens by document frequency (distinct
    * per doc, then group) — the df side of tf-idf and the stopword-list
    * bootstrap for corpus-specific quality filters. */
  val vocabTopk = QuerySpec(
    "vocab_topk",
    (s, d) =>
      documents(s, d)
        // relational filter after explode (codegen) rather than the
        // interpreted filter() lambda inside the array
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("t"))
        .filter(col("t") =!= "")
        .distinct()
        .groupBy("t")
        .agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("t"))
        .limit(50),
    Some("""SELECT t, count(*) AS doc_freq
            FROM (SELECT DISTINCT doc_id,
                    UNNEST(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS t
                  FROM documents)
            GROUP BY t ORDER BY doc_freq DESC, t LIMIT 50""")
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
      val v = (0 until 8).map(i =>
        s"(strpos('0123456789abcdef', substr(md5('split-v1:' || text), ${i + 1}, 1)) - 1) * ${1L << (4 * (7 - i))}")
        .mkString(" + ")
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
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val url = "https?://[^ ]+"
      val digits = "[0-9]{7,}"
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

  val all: Seq[QuerySpec] =
    Seq(langId, qualityScore, tokenCount, docFingerprint, vocabTopk,
        sampleSplit, piiDetect)
}
