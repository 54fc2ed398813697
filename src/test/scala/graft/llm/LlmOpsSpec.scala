package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics tests for the LLM-pipeline operator family on hand-built
  * miniature inputs. */
class LlmOpsSpec extends SparkSpec {
  lazy val s = spark
  import s.implicits._

  test("quantized dot product is exact on known vectors") {
    val df = Seq((Array(1.0f, 2.0f, -0.5f), Array(2.0f, 0.5f, 4.0f)))
      .toDF("a", "b")
      .select(Similarity.quantDot("a", "b").as("dot"))
    // floor(1*1000)*floor(2*1000) + floor(2*1000)*floor(0.5*1000)
    //   + floor(-0.5*1000)*floor(4*1000)
    // = 1000*2000 + 2000*500 + (-500)*4000 = 2_000_000+1_000_000-2_000_000
    assert(df.first().getLong(0) == 1000000L)
  }

  test("cosine of a vector with itself is 1") {
    val df = Seq((Array(0.3f, -0.7f, 0.2f), Array(0.3f, -0.7f, 0.2f)))
      .toDF("a", "b").select(Similarity.cosine("a", "b").as("c"))
    assert(math.abs(df.first().getDouble(0) - 1.0) < 1e-12)
  }

  test("identical docs share minhash signature; different docs don't") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely unrelated content about database engines and joins"))
      .toDF("doc_id", "text")
    val sig = docs
      .select($"doc_id", explode(TextOps.charShingles(8)).as("s"))
      .groupBy("doc_id")
      .agg(min(md5($"s")).as("h0"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("simhash: identical docs get identical 32-bit signatures") {
    val docs = Seq(
      (1L, "spark catalyst optimizer rules rewrite logical plans"),
      (2L, "spark catalyst optimizer rules rewrite logical plans"),
      (3L, "grouping aggregation shuffle exchange partitions"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L))
    assert(got(1L) != got(3L))
    assert(got.values.forall(v => v >= 0 && v < (1L << 32)))
  }

  test("language ID picks the language with most stopword hits") {
    val q = TextOps.langId.fn(spark, sf)
    val schema = q.schema.fieldNames.toSet
    assert(Set("doc_id", "pred_lang", "claimed_lang").subsetOf(schema))
    val preds = q.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "de", "fr", "es", "und")))
  }

  test("multimodal stub decode is deterministic and batch-shaped") {
    val m1 = Multimodal.decodeStub(7L, Array.fill[Byte](2048)(1))
    val m2 = Multimodal.decodeStub(7L, Array.fill[Byte](2048)(1))
    assert(m1 == m2)
    assert(m1.byte_len == 2048 && m1.est_frames == 3 && m1.channels == 3)
    val df = Multimodal.decodeAll(spark, sf)
    assert(df.columns.toSeq == Seq("doc_id", "byte_len", "width", "height",
      "channels", "est_frames"))
    // plumbing equivalence: mapPartitions stub == column-op twin
    val viaCols = Multimodal.meta.fn(spark, sf)
      .select("doc_id", "byte_len", "width", "height", "channels", "est_frames")
    assert(df.exceptAll(viaCols).count() == 0)
  }

  test("exact dedup keeps the minimum doc_id per content hash") {
    val docs = Seq((5L, "same"), (2L, "same"), (9L, "other"))
      .toDF("doc_id", "text")
    val got = docs.groupBy(md5($"text").as("h"))
      .agg(min("doc_id").as("keep"), count(lit(1)).as("cnt"))
      .orderBy("keep")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((2L, 2L), (9L, 1L)))
  }

  test("winnowing: every full window of 4 gram starts contains a fingerprint") {
    // the w-coverage guarantee that makes winnowing a LOCAL fingerprint:
    // consecutive selected positions can never be more than w apart, the
    // first pick is within the first window, the last within the last
    val text = "the quick brown fox jumps over the lazy dog while a " +
      "second sentence pads this document long enough to winnow properly"
    val fps = TextOps.winnowFingerprints(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().map(_.getAs[Long]("pos")).sorted
    val n = text.length - 7L
    assert(fps.nonEmpty && fps.head <= 4 && fps.last >= n - 3)
    fps.sliding(2).foreach { case Array(a, b) =>
      assert(b - a <= 4, s"coverage gap $a -> $b")
    }
  }

  test("winnowing: a shared passage at different offsets shares fingerprints") {
    val passage = "an identical long passage spliced into both documents " +
      "that must produce at least one common winnowing fingerprint hash"
    val d1 = s"unique prefix one ${passage} unique suffix alpha"
    val d2 = s"a totally different and longer leading section ${passage} tail"
    val fp = TextOps.winnowFingerprints(
        Seq((1L, d1), (2L, d2)).toDF("doc_id", "text"))
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) => id -> rs.map(_.getAs[Long]("fp_hash")).toSet }
    val shared = fp(1L) intersect fp(2L)
    assert(shared.nonEmpty, "shared passage produced no common fingerprint")
  }

  test("quality_band_filter: banding is monotone in score within each language, ties share a band") {
    val rows = TextOps.qualityBandFilter.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set(1L, 2L, 3L)(r.getAs[Long]("band"))))
    assert(rows.forall(r =>
      r.getAs[Long]("keep_flag") == (if (r.getAs[Long]("band") <= 2) 1L else 0L)))
    for ((_, rs) <- rows.groupBy(_.getAs[String]("lang"))) {
      // higher score → never a worse (higher) band; equal score → same band
      val byScore = rs.map(r =>
        r.getAs[Long]("stop_milli") -> r.getAs[Long]("band"))
      for (Seq((q1, b1), (q2, b2)) <- byScore.combinations(2).map(_.toSeq)) {
        if (q1 == q2) assert(b1 == b2, s"tie split: $q1 -> $b1 vs $b2")
        else if (q1 > q2) assert(b1 <= b2, s"monotonicity: $q1->$b1, $q2->$b2")
        else assert(b2 <= b1, s"monotonicity: $q2->$b2, $q1->$b1")
      }
    }
  }

  test("vocab_coverage agrees with token_count and stays in bounds") {
    val cov = TextOps.vocabCoverage.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("in_vocab"),
          r.getAs[Long]("oov_milli"))).toMap
    val tok = TextOps.tokenCount.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("ws_tokens")).toMap
    assert(cov.keySet == tok.keySet)
    for ((id, (nt, nv, oov)) <- cov) {
      assert(nt == tok(id), s"doc $id: n_tokens $nt != ws_tokens ${tok(id)}")
      assert(nv >= 0 && nv <= nt, s"doc $id: in_vocab $nv outside [0, $nt]")
      assert(oov >= 0 && oov <= 1000, s"doc $id: oov_milli $oov")
    }
    // the top-10 vocab of this corpus must cover SOMETHING, and not
    // everything — otherwise the key degenerates
    assert(cov.values.exists(_._2 > 0))
    assert(cov.values.exists(v => v._2 < v._1))
  }

  test("quality_band_filter: NULL lang and NULL text docs appear in the profile via sentinels, never vanish") {
    val docs = Seq(
      (1L, Option("the and of is words here"), Option("en")),
      (2L, Option("zebra quark flux"), Option("en")),
      (3L, Option("the and of is more the and"), None),   // NULL lang
      (4L, None, Option("en")),                            // NULL text
      (5L, None, None)                                     // both NULL
    ).toDF("doc_id", "text", "lang")
    val out = TextOps.qualityBandOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("lang"), r.getAs[Long]("stop_milli"),
          r.getAs[Long]("band"), r.getAs[Long]("keep_flag"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L),
      s"docs lost from the curation profile: ${out.keySet}")
    assert(out(3L)._1 == "", "NULL lang must band under the '' sentinel")
    // score-less docs are banded 3 / not kept UNCONDITIONALLY — even in
    // a language made ENTIRELY of sentinel docs (doc 5's '' lang) they
    // must not occupy band 1 of an empty histogram
    for (id <- Seq(4L, 5L)) {
      assert(out(id)._2 == -1L, s"doc $id: expected sentinel score")
      assert(out(id)._3 == 3L && out(id)._4 == 0L,
        s"doc $id: score-less doc must be band 3 / keep 0, got ${out(id)}")
    }
  }

  test("pipeline_quality_pack: composed survivors equal the stagewise intersection, packed in doc_id order") {
    val out = TextOps.pipelineQualityPack.fn(spark, sf).collect()
    val band = TextOps.qualityBandFilter.fn(spark, sf)
      .filter(col("keep_flag") === 1)
      .select("doc_id").as[Long].collect().toSet
    val clean = TextOps.corpusClean.fn(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val train = TextOps.leakageSafeSplit.fn(spark, sf)
      .filter(col("split") === "train")
      .select("doc_id").as[Long].collect().toSet
    val expect = band & clean & train
    assert(out.map(_.getAs[Long]("doc_id")).toSet == expect,
      s"composed plan != stagewise composition (${out.length} vs ${expect.size})")
    assert(out.nonEmpty, "pipeline filtered the whole corpus — fixture degenerate")
    // pack invariant over the surviving set: start_pos is the running
    // token sum in doc_id order
    val sorted = out.sortBy(_.getAs[Long]("doc_id"))
    var run = 0L
    for (r <- sorted) {
      assert(r.getAs[Long]("start_pos") == run,
        s"doc ${r.getAs[Long]("doc_id")}: start_pos ${r.getAs[Long]("start_pos")} != $run")
      run += r.getAs[Long]("n_tokens")
    }
  }
}
