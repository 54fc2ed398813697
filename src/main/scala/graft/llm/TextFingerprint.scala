package graft.llm

import graft.Tables._
import graft.QuerySpec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TextOps seam 3 — FINGERPRINTING: whole-doc shingle fingerprints,
  * winnowing/MOSS local fingerprints and their shared-passage pairing,
  * and PMI collocation mining over the same token machinery.
  *
  * Mixed into [[TextOps]] (the single public surface) — the split is
  * file organization only; call sites and semantics are unchanged. */
private[llm] trait TextFingerprint { self: TextOps.type =>

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

  /** Document fingerprinting via rolling shingle hashes: the winnowing-
    * style (min, max) of md5 over 8-char shingles plus the distinct
    * shingle count — a compact per-doc signature for near-dup triage. */
  val docFingerprint = QuerySpec(
    "doc_fingerprint",
    // Per-row array aggregation, NOT groupBy(doc_id) over exploded
    // shingle rows: every aggregate here is per-document and a document
    // is one input row, so min/max/distinct-count are computable
    // map-side over the shingle array — the groupBy form shuffled the
    // FULL gram stream (3 exchanges + SortAggregate over ~n_chars rows
    // per doc; 83 MB shuffle read at sf0.1 bench) to compute what never
    // needed to leave its row. The isNotNull filter mirrors the explode
    // form's semantics (a null text exploded to zero rows, dropping the
    // doc from the output).
    (s, d) =>
      documents(s, d)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), charShingles(8).as("shs"))
        .select(col("doc_id"),
          expr("transform(shs, s -> md5(s))").as("hs"),
          size(array_distinct(col("shs"))).cast("long").as("n_shingles"))
        .select(col("doc_id"),
          array_min(col("hs")).as("fp_min"),
          array_max(col("hs")).as("fp_max"),
          col("n_shingles"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, min(md5(s)) AS fp_min, max(md5(s)) AS fp_max,
                   count(DISTINCT s) AS n_shingles
            FROM (SELECT doc_id, substr(text, i, 8) AS s
                  FROM documents,
                       UNNEST(generate_series(1, greatest(length(text)-7, 1))) AS t(i))
            GROUP BY doc_id ORDER BY doc_id""")
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
    // Fully map-side (r19): the sliding 4-window minimum and the
    // (doc_id, k) distinct are both PER-DOCUMENT, and a document is one
    // input row — so the window that previously rode a hash(doc_id)
    // exchange + per-doc sort, and the distinct that paid a second
    // exchange, collapse into array expressions over the per-row gram
    // hash array: the whole fingerprint build is now a single
    // WholeStageCodegen-with-fallback map stage, zero shuffles
    // (stage build 1.65 s → 0.9 s at sf0.1, exchanges 2 → 0).
    // length ≥ 11 ⟺ n = len−7 ≥ 4 replaces the old post-window
    // `pos ≤ n−3` guard: winnowing is defined on FULL windows, and a
    // doc with n < 4 has none (the old form computed its truncated
    // window rows and then filtered every one of them out).
    docs
      .filter(length(col("text")) >= 11)
      .select(col("doc_id"),
        expr("transform(sequence(1, length(text) - 7), " +
          "i -> cast(conv(substring(md5(substring(text, i, 8)), 1, 8), 16, 10) as bigint))")
          .as("vs"))
      .select(col("doc_id"),
        explode(expr(
          s"""array_distinct(transform(sequence(1, size(vs) - 3), p ->
                least((element_at(vs, p) + 1L) * ${C}L - p,
                      (element_at(vs, p + 1) + 1L) * ${C}L - (p + 1),
                      (element_at(vs, p + 2) + 1L) * ${C}L - (p + 2),
                      (element_at(vs, p + 3) + 1L) * ${C}L - (p + 3))))"""))
          .as("k"))
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
      // partition-local sort before the parquet write (NO exchange —
      // r19): the map-side fingerprint build emits rows in window order,
      // and writing them (doc_id, pos)-clustered restores the read-side
      // locality both consumer keys had when the build went through a
      // doc_id exchange, at the cost of an in-partition sort only
      winnowFingerprints(documents(s, d))
        .sortWithinPartitions("doc_id", "pos"))

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
}
