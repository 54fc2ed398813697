package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental (delta) dedup: a new shard is deduped against the
  * EXISTING corpus's materialized band index without recomputing it.
  * Under test: (1) a shard doc duplicating an old corpus doc is
  * caught, a novel one survives, and intra-shard dups resolve
  * first-wins; (2) the incremental plan computes exactly the
  * full-corpus pipeline restricted to the shard (the property the
  * driver oracle checks at sf0.01, here at sf0.001 against the
  * shipped full pipeline itself).
  */
class DeltaDedupSpec extends SparkSpec {
  import spark.implicits._

  test("shard doc duplicating an old corpus doc is caught; novel docs survive; intra-shard is first-wins") {
    val dupText = "the quick brown fox jumps over the lazy dog and then " +
      "does it all over again because near duplicate corpora love this"
    val corpus = Seq(
      (1L, dupText),
      (2L, "a completely different corpus document about spark shuffle " +
        "partitioning and the economics of broadcast joins at scale"))
      .toDF("doc_id", "text")
    val shard = Seq(
      (10L, dupText), // verbatim copy of corpus doc 1
      (11L, "a genuinely novel shard document mentioning watermarks, " +
        "state stores and structured streaming output modes"),
      (12L, dupText)) // copy of 1 AND of shard doc 10
      .toDF("doc_id", "text")
    val out = Dedup
      .deltaDedupOf(Dedup.bandsOf(Dedup.signaturesOf(corpus)), shard)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(2)))
      .toSeq
    // 12's partners are corpus doc 1 AND shard doc 10 — dup_of takes the
    // smallest (the corpus canonical), not just "some partner"
    assert(out == Seq((10L, 1L, 1L), (11L, -1L, 0L), (12L, 1L, 1L)), out.toString)
  }

  test("delta equals the full-corpus pipeline restricted to the shard (sf0.001)") {
    val docs = graft.Tables.documents(spark, sf)
    val split = Dedup.deltaSplitOf(spark, sf)
    // from-scratch ground truth: the SHIPPED full candidate pipeline
    // over corpus ∪ shard, restricted to shard-side rows
    val full = Dedup.candidatePairsOf(docs)
      .filter(col("id2") >= split)
      .groupBy(col("id2").as("doc_id"))
      .agg(min(col("id1")).as("dup_of"))
    val expected = docs.filter(col("doc_id") >= split).select("doc_id")
      .join(full, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"),
        col("dup_of").isNotNull.cast("long").as("is_dup"))
      .orderBy("doc_id")
      .collect()
      .toSeq
    val got = graft.SparkEntry.queries("delta_dedup")(spark, sf)
      .collect().toSeq
    assert(got.nonEmpty, "empty shard at sf0.001")
    assert(got == expected,
      s"incremental != full-restricted:\n got=$got\n exp=$expected")
  }
}
