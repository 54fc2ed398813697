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
object TextOps extends TextScoring with TextPacking with TextFingerprint {

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

  val all: Seq[QuerySpec] =
    Seq(langId, qualityScore, qualityBandFilter, tokenCount, docFingerprint,
        vocabTopk, vocabCoverage,
        sampleSplit, piiDetect, piiRedact, textNormalize, repetitionRatio,
        stratifiedSample, weightedSample, bm25TopK, tfidfTopk, sequencePack,
        docChunk,
        trigramFamiliarity, sourceMix, winnowFingerprint, collocationPmi,
        leakageSafeSplit, sharedPassagePairs, corpusClean, sourceInterleave,
        spanCorruption, bpeMergePairs, bpeEncode, bpeSequencePack,
        pipelineQualityPack, globalShuffle,
        mixtureAllocate, repeatUpsample, curriculumSchedule, dsirWeights,
        lengthBucketPack, packingEfficiency, tokenizerFertility,
        shardManifest, corpusToShards, deltaCorpusToShards)
}
