package graft.llm

import graft.SparkSpec

/** Independent driver-side references for cdc_chunk_dedup and
  * ann_recall_calib, plus the CDC property that justifies the operator:
  * content-defined boundaries realign after an insert, fixed-size blocks
  * don't. */
class CdcAnnCalibSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Plain-Scala twin of the engine's chunker: boundary at i (1-based,
    * i >= 8) iff md5 of the 8-char window ending at i starts with '0';
    * every doc ends its last chunk at len. */
  private def chunksOf(text: String): Seq[String] = {
    if (text.isEmpty) return Seq.empty
    val bounds = (8 to text.length)
      .filter(i => md5hex(text.substring(i - 8, i)).startsWith("0"))
    val ends = (bounds :+ text.length).distinct.sorted
    ends.zip(0L +: ends.dropRight(1).map(_.toLong))
      .map { case (e, s) => text.substring(s.toInt, e) }
  }

  test("cdc_chunk_dedup matches a plain-Scala reference on sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
      .filter(_._2.nonEmpty).toSeq
    val occ = docs.flatMap { case (id, text) =>
      var start = 1L
      chunksOf(text).map { c =>
        val s = start; start += c.length
        (md5hex(c), id, s, c.length.toLong)
      }
    }
    val expected = occ.groupBy(_._1).toSeq.map { case (h, rows) =>
      (h, rows.size.toLong,
        rows.map(_._2).distinct.size.toLong,
        rows.map(_._4).min,
        rows.map(r => r._2 * 4294967296L + r._3).min)
    }.sortBy(_._1)
    val got = Multimodal.cdcChunkDedup.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // the corpus must actually exercise cross-doc chunk sharing
    assert(expected.exists(_._3 > 1L))
  }

  test("CDC boundaries realign after a prefix insert; fixed-size blocks don't") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "walks along the river bank looking for interesting stones " +
      "before heading home across the old wooden bridge at sunset"
    val edited = "INSERTED PREFIX >> " + base
    val a = chunksOf(base).map(md5hex).toSet
    val b = chunksOf(edited).map(md5hex).toSet
    // all chunks strictly after the first post-edit boundary realign:
    // only the chunk(s) covering the edit region may differ
    val shared = a.intersect(b).size
    assert(shared >= a.size - 2,
      s"CDC failed to realign: only $shared of ${a.size} chunks shared")
    // fixed-size blocking (same average length) shares NO block after a
    // non-multiple-length prefix insert — the property CDC exists to fix
    val fix = base.grouped(16).map(md5hex).toSet
    val fixEdited = edited.grouped(16).map(md5hex).toSet
    assert(fix.intersect(fixEdited).size <= 1)
  }

  test("ann_recall_calib equals the FULL-exact recomputation from its " +
      "component keys' outputs (the spec-only full-exact variant)") {
    // r12 task-3 contract: the key's ground truth is md5-SAMPLED with
    // divisor max(1, N div 4096); below 2·4096 vectors the divisor is 1
    // and sampled == full — so at THIS corpus the full-exact calibration
    // (ann_topk's own tier, nested verbatim below) must equal the key
    // bit-for-bit. The sampled path itself is exercised independently on
    // a 9000-vector corpus in AnnIndexSpec.
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(nVecs / 4096 <= 1, s"sf0.001 grew past the div-1 regime ($nVecs)")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = rows(Similarity.annBruteForce.fn(spark, sf)
      .filter(org.apache.spark.sql.functions.col("rank") <= 3))
    val lsh = rows(Similarity.annLshBucket.fn(spark, sf))
    val ivf = rows(Similarity.annIvf.fn(spark, sf))
    val truth = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = truth.keys.toSeq.sorted.map { q =>
      val t = truth(q).size.toLong
      val lh = lsh.count(p => p._1 == q && truth(q).contains(p._2)).toLong
      val ih = ivf.count(p => p._1 == q && truth(q).contains(p._2)).toLong
      (q, t, lh, 1000 * lh / t, ih, 1000 * ih / t)
    }
    val got = Similarity.annRecallCalib.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
  }
}
