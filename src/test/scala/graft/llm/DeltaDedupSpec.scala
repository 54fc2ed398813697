package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental (delta) dedup: a new shard is deduped against the
  * EXISTING corpus's materialized signature index without recomputing
  * it. Under test: (1) a shard doc duplicating an old corpus doc is
  * caught, a novel one survives, and intra-shard dups resolve
  * first-wins; (2) the estimated-Jaccard verify tier rejects a
  * band-collision candidate with < 5 agreeing slots (band collision is
  * a candidate signal, not a verdict) while accepting one with ≥ 5;
  * (3) the incremental plan computes exactly the full-corpus
  * pipeline + verify rule restricted to the shard (the property the
  * driver oracle checks at sf0.01, here at sf0.001 against the
  * shipped full pipeline itself); (4) the same three properties for
  * the second index family, delta_simhash.
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
      .deltaDedupOf(Dedup.signaturesOf(corpus), shard)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(2)))
      .toSeq
    // 12's partners are corpus doc 1 AND shard doc 10 — dup_of takes the
    // smallest (the corpus canonical), not just "some partner"
    assert(out == Seq((10L, 1L, 1L), (11L, -1L, 0L), (12L, 1L, 1L)), out.toString)
  }

  test("verify tier: a band collision with only its own 4 slots is rejected; one extra agreeing slot passes") {
    // hand-crafted signatures (a natural-text band collision with < 5
    // agreeing slots is not constructible on demand): every row shares
    // h0..h3 with the corpus doc, so band 0 collides for all three
    // shard docs — the verify tier alone decides their fate
    def sig(id: Long, h: Seq[String]) =
      (id, h(0), h(1), h(2), h(3), h(4), h(5), h(6), h(7))
    val cols = "doc_id" +: (0 until 8).map(i => s"h$i")
    val band0 = Seq("aaaa", "bbbb", "cccc", "dddd")
    val corpusSig = Seq(
      sig(1L, band0 ++ Seq("e1", "f1", "g1", "k1")))
      .toDF(cols: _*)
    val shardSig = Seq(
      // band-0 collision, 0 extra slots: 4/8 = 500 milli < 625 → NOT dup
      sig(10L, band0 ++ Seq("e2", "f2", "g2", "k2")),
      // band-0 collision + one agreeing extra slot: 5/8 = 625 → dup
      sig(11L, band0 ++ Seq("e1", "f3", "g3", "k3")))
      .toDF(cols: _*)
    val out = Dedup
      .deltaDedupFromSigs(corpusSig, shardSig,
        Seq(10L, 11L).toDF("doc_id"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(2)))
      .toSeq
    assert(out == Seq((10L, -1L, 0L), (11L, 1L, 1L)), out.toString)
  }

  test("delta equals the full-corpus pipeline + verify rule restricted to the shard (sf0.001)") {
    val docs = graft.Tables.documents(spark, sf)
    val split = Dedup.deltaSplitOf(spark, sf)
    // from-scratch ground truth: the SHIPPED full candidate pipeline
    // over corpus ∪ shard, through the SAME verify tier, restricted to
    // shard-side rows
    val full = Dedup
      .verifiedPairs(Dedup.candidatePairsOf(docs),
        Dedup.signaturesOf(docs))
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

  test("delta_simhash: corpus dup caught, novel doc survives, intra-shard first-wins") {
    val dupText = "the quick brown fox jumps over the lazy dog and then " +
      "does it all over again because near duplicate corpora love this"
    val corpus = Seq(
      (1L, dupText),
      (2L, "a completely different corpus document about spark shuffle " +
        "partitioning and the economics of broadcast joins at scale"))
      .toDF("doc_id", "text")
    val shard = Seq(
      (10L, dupText),
      (11L, "a genuinely novel shard document mentioning watermarks, " +
        "state stores and structured streaming output modes"),
      (12L, dupText))
      .toDF("doc_id", "text")
    val out = Dedup
      .deltaSimhashOf(Dedup.simhashSignatures(corpus), shard)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(2)))
      .toSeq
    assert(out == Seq((10L, 1L, 1L), (11L, -1L, 0L), (12L, 1L, 1L)), out.toString)
  }

  test("delta_simhash equals the full hamming pipeline restricted to the shard (sf0.001)") {
    val docs = graft.Tables.documents(spark, sf)
    val split = Dedup.deltaSplitOf(spark, sf)
    // ground truth: the pre-collapse per-document byte-block hamming
    // search over corpus ∪ shard, restricted to shard-side rows — an
    // algorithmically independent derivation (the shipped
    // simhash_hamming_pairs now collapses to distinct signature
    // values first; this test deliberately does not)
    val sig = Dedup.simhashSignatures(docs).localCheckpoint(false)
    val blocks = Dedup.hammingBlocksOf(sig)
    val full = blocks.as("a")
      .join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.nib") === col("b.nib") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("a.simhash").as("s1"),
        col("b.doc_id").as("id2"), col("b.simhash").as("s2"))
      .distinct()
      .filter(expr("bit_count(s1 ^ s2)") <= 3 && col("id2") >= split)
      .groupBy(col("id2").as("doc_id"))
      .agg(min(col("id1")).as("dup_of"))
    val expected = docs.filter(col("doc_id") >= split).select("doc_id")
      .join(full, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"),
        col("dup_of").isNotNull.cast("long").as("is_dup"))
      .orderBy("doc_id")
      .collect()
      .toSeq
    val got = graft.SparkEntry.queries("delta_simhash")(spark, sf)
      .collect().toSeq
    assert(got.nonEmpty, "empty shard at sf0.001")
    assert(got == expected,
      s"incremental != full-restricted:\n got=$got\n exp=$expected")
  }
}
