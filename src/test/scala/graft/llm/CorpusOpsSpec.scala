package graft.llm

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic-quality checks for the round-4 corpus operators: the oracle
  * gate proves Spark≡DuckDB; these prove the right thing is computed
  * (independent recounts, group invariants, prune-is-invisible). */
class CorpusOpsSpec extends SparkSpec {

  test("curriculum_schedule: pos is a permutation, bands are contiguous, intra-band order is the md5 shuffle") {
    val rows = SparkEntry.queries("curriculum_schedule")(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq == (0L until n).toSeq)
    // band blocks are contiguous and ordered: every band-b position is
    // below every band-(b+1) position
    val byBand = rows.groupBy(_.getAs[Long]("band")).view
      .mapValues(_.map(_.getAs[Long]("pos"))).toMap
    val bandsAsc = byBand.keys.toSeq.sorted
    bandsAsc.zip(bandsAsc.tail).foreach { case (lo, hi) =>
      assert(byBand(lo).max < byBand(hi).min, s"bands $lo/$hi interleave")
    }
    // every quality band is populated (the curriculum is non-degenerate)
    assert(bandsAsc.size >= 2, s"only bands $bandsAsc present")
    // intra-band order = (md5 bucket, md5 key, doc_id) — recompute
    val md = java.security.MessageDigest.getInstance("MD5")
    def k(id: Long): String = {
      val h = md.digest(s"cur-v1:$id".getBytes("UTF-8"))
      h.map("%02x".format(_)).mkString
    }
    byBand.foreach { case (band, _) =>
      val inBand = rows.filter(_.getAs[Long]("band") == band)
      val byPos = inBand.sortBy(_.getAs[Long]("pos")).map(_.getLong(0))
      val byKey = inBand.map(_.getLong(0))
        .sortBy(id => (k(id), id))
      assert(byPos.toSeq == byKey.toSeq, s"band $band order != md5 shuffle")
    }
  }

  test("bm25_topk: scores recompute exactly from raw tf/df/dl, cut is the true top-20") {
    val rows = SparkEntry.queries("bm25_topk")(spark, sf).collect()
    assert(rows.length == 20)
    // independent driver-side recomputation from the raw corpus
    val terms = Set("spark", "join", "dup")
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty).toSeq)
      .toMap
    val dl = docs.view.mapValues(_.length.toLong).toMap
    val a = BigInt(dl.values.sum)
    val nd = BigInt(dl.size)
    val tf = docs.toSeq.flatMap { case (id, ts) =>
      ts.filter(terms).groupBy(identity).map { case (t, xs) =>
        (id, t) -> BigInt(xs.length) }
    }.toMap
    val df = tf.keys.groupBy(_._2).view.mapValues(c => BigInt(c.size)).toMap
    val score = docs.keys.map { id =>
      id -> terms.toSeq.flatMap { t =>
        tf.get((id, t)).map { f =>
          ((nd - df(t) + 1) * 22 * f * a * 1000000) /
            ((df(t) + 1) * (10 * f * a + 3 * a + 9 * dl(id) * nd))
        }
      }.sum
    }.toMap
    val universe = tf.keys.map(_._1).toSet // docs with ≥1 query term
    val want = score.toSeq.filter(p => universe(p._1))
      .sortBy { case (id, s) => (-s, id) }.take(20).toMap
    assert(rows.map(_.getLong(0)).toSet == want.keySet)
    rows.foreach { r =>
      assert(BigInt(r.getAs[Long]("score_ppm")) == want(r.getLong(0)), r)
      assert(r.getAs[Long]("dl") == dl(r.getLong(0)), r)
    }
    // idf must bite: the rare term's docs outrank a pure
    // common-term doc of the same length class (sanity of ranking)
    assert(want.values.max > want.values.min)
  }

  test("knn_graph: edges are exactly the mutual same-bucket top-3 pairs") {
    val rows = SparkEntry.queries("knn_graph")(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent recomputation: bucket + quantized dot in driver code
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def bucket(v: Array[Float]): Int =
      (0 until 8).map(i =>
        if (i < v.length && v(i).toDouble > 0) 1 << i else 0).sum
    def dot(a: Array[Float], b: Array[Float]): Long =
      (0 until math.min(a.length, b.length)).map(i =>
        math.floor(a(i).toDouble * 1000).toLong *
          math.floor(b(i).toDouble * 1000).toLong).sum
    val byBucket = vecs.toSeq.groupBy { case (_, v) => bucket(v) }
    val topk: Map[Long, Seq[Long]] = byBucket.values.flatMap { members =>
      members.map { case (id, v) =>
        id -> members.filter(_._1 != id)
          .map { case (oid, ov) => (dot(v, ov), oid) }
          .sortBy { case (s, oid) => (-s, oid) }.take(3).map(_._2)
      }
    }.toMap
    val wantEdges = (for {
      (a, ns) <- topk.toSeq; b <- ns
      if a < b && topk(b).contains(a)
    } yield (a, b)).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == wantEdges)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(r.getAs[Long]("dot") == dot(vecs(a), vecs(b)), r)
      assert(r.getAs[Long]("rank_fwd") == topk(a).indexOf(b) + 1, r)
      assert(r.getAs[Long]("rank_rev") == topk(b).indexOf(a) + 1, r)
    }
  }

  test("collocation_pmi: lift recomputes from raw counts, ordering is total") {
    val rows = SparkEntry.queries("collocation_pmi")(spark, sf).collect()
    assert(rows.length == 40)
    // independent recount of the corpus stats in driver code
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(split(lower(col("text")), " ").as("l"))
      .collect().map(_.getSeq[String](0).toArray)
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val bi = scala.collection.mutable.Map.empty[(String, String), Long]
    for (l <- toks) {
      for (w <- l if w.nonEmpty) uni(w) = uni.getOrElse(w, 0L) + 1
      for (i <- 0 until l.length - 1 if l(i).nonEmpty && l(i + 1).nonEmpty)
        bi((l(i), l(i + 1))) = bi.getOrElse((l(i), l(i + 1)), 0L) + 1
    }
    val n = BigInt(uni.values.sum)
    val m = BigInt(bi.values.sum)
    rows.foreach { r =>
      val (w1, w2) = (r.getString(0), r.getString(1))
      val cxy = BigInt(bi((w1, w2)))
      assert(r.getAs[Long]("cxy") == cxy.toLong, r)
      val want = (cxy * n * n * 1000) / (m * uni(w1) * uni(w2))
      assert(r.getAs[Long]("lift_milli") == want.toLong, s"$r want=$want")
    }
    // rows arrive in the declared total order
    val key = rows.map(r => (-r.getAs[Long]("lift_milli"), r.getString(0), r.getString(1)))
    assert(key.sameElements(key.sorted))
  }

  test("leakage_safe_split: split is constant within a source group") {
    val rows = SparkEntry.queries("leakage_safe_split")(spark, sf).collect()
    assert(rows.length == 500)
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      assert(rs.map(_.getAs[String]("split")).toSet.size == 1,
        s"source $src straddles splits")
    }
    assert(rows.map(_.getAs[String]("split")).toSet.subsetOf(
      Set("train", "val", "test")))
  }

  test("shared_passage_pairs: every reported pair shares a verbatim 8-gram") {
    val pairs = SparkEntry.queries("shared_passage_pairs")(spark, sf).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Long]("shared_cnt")))
    assert(pairs.nonEmpty)
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String) = (0 to t.length - 8).map(i => t.substring(i, i + 8)).toSet
    pairs.foreach { case (a, b, cnt) =>
      assert(cnt >= 5, s"($a,$b) cnt=$cnt below threshold")
      assert((grams(texts(a)) & grams(texts(b))).nonEmpty,
        s"($a,$b) reported but no verbatim 8-gram in common")
    }
  }

  test("bloom_prune_join: the bloom prune never changes the exact answer") {
    val got = SparkEntry.queries("bloom_prune_join")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("hit_cnt")).toMap
    // plain exact semi-join, no bloom anywhere
    val docs = graft.Tables.documents(spark, sf)
    val bsh = TextOps.shingleRows(docs.filter(col("doc_id") < 20), 8)
      .select("s").distinct()
    val want = TextOps.shingleRows(docs.filter(col("doc_id") >= 20), 8)
      .distinct()
      .join(bsh, Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("hit_cnt"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("hit_cnt")).toMap
    assert(got == want)
  }

  test("ann_pq: codes are true sub-space argmins, ADC sums reconstruct") {
    val rows = SparkEntry.queries("ann_pq")(spark, sf).collect()
    assert(rows.nonEmpty)
    // driver-side ground truth: quantized vectors, seed codebook,
    // per-sub argmin encode, asymmetric distance tables
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(f => math.floor(f.toDouble * 1000).toLong).toArray)
      .toMap
    // mirror quantComponents/seedIdsOf/widenByDim semantics exactly:
    // empty vectors contribute no components so they can never seed the
    // codebook; the codebook grid spans the UNION of seed dims with
    // missing entries zero-filled; and a dim contributes only when both
    // the candidate vector and the grid have it — without this, an
    // empty/short embedding among the smallest ids (the exact case
    // seedIdsOf defends against) would make the mirror diverge or throw
    val seeds = vecs.filter(_._2.nonEmpty).keys.toSeq.sorted.take(16)
    val gridLen = seeds.map(vecs(_).length).max
    def subDist(v: Array[Long], c: Array[Long], sub: Int): Long =
      (sub * 16 until (sub + 1) * 16)
        .filter(i => i < v.length && i < gridLen)
        .map { i =>
          val ci = if (i < c.length) c(i) else 0L
          (v(i) - ci) * (v(i) - ci)
        }.sum
    def encode(v: Array[Long]): Array[Int] =
      Array.tabulate(4) { sub =>
        seeds.indices.minBy(k => (subDist(v, vecs(seeds(k)), sub), k))
      }
    val codes = vecs.map { case (id, v) => id -> encode(v) }
    rows.foreach { r =>
      val (qid, vid) = (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))
      val want = (0 until 4).map(sub =>
        subDist(vecs(qid), vecs(seeds(codes(vid)(sub))), sub)).sum
      assert(r.getAs[Long]("adist") == want, s"$r want=$want")
    }
    // ranks are 1..5 per query, ascending adist
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
      val ds = sorted.map(_.getAs[Long]("adist"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
  }

  test("corpus_clean: survivors are exactly the intersection of the component gates") {
    val got = SparkEntry.queries("corpus_clean")(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    // recompute each gate from the COMPONENT keys' own outputs
    val en = SparkEntry.queries("lang_id")(spark, sf).collect()
      .filter(_.getAs[String]("pred_lang") == "en")
      .map(_.getAs[Long]("doc_id")).toSet
    val quality = SparkEntry.queries("quality_score")(spark, sf).collect()
      .filter(r => r.getAs[Long]("n_tokens") >= 20 &&
        r.getAs[Long]("stop_milli") >= 10 && r.getAs[Long]("alpha_milli") >= 600)
      .map(_.getAs[Long]("doc_id")).toSet
    val noPii = SparkEntry.queries("pii_detect")(spark, sf).collect()
      .filter(_.getAs[Long]("pii_flag") == 0L)
      .map(_.getAs[Long]("doc_id")).toSet
    val canon = SparkEntry.queries("dedup_exact")(spark, sf).collect()
      .map(_.getAs[Long]("keep_id")).toSet
    assert(got == (en & quality & noPii & canon),
      s"clean-set mismatch: extra=${got -- (en & quality & noPii & canon)} missing=${(en & quality & noPii & canon) -- got}")
    assert(got.nonEmpty)
  }

  test("source_interleave: positions are a permutation, prefixes are weight-proportional") {
    val rows = SparkEntry.queries("source_interleave")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq == (1L to rows.length))
    // deficit-scheduler fairness: below any priority threshold T, source
    // s has emitted floor(T·w_s/10⁶) docs (capped by its size) — the
    // proportional-mixing contract the weights promise
    val bySource = rows.groupBy(_.getAs[String]("source"))
    val sizes = bySource.map { case (s, rs) => s -> rs.length.toLong }
    val weights = bySource.map { case (s, rs) =>
      s -> rs.head.getAs[Long]("weight_milli") }
    for (t <- Seq(2000000L, 10000000L, 30000000L)) {
      bySource.foreach { case (src, rs) =>
        val emitted = rs.count(_.getAs[Long]("priority") <= t).toLong
        val expected = math.min(t * weights(src) / 1000000L, sizes(src))
        assert(math.abs(emitted - expected) <= 1, s"$src at T=$t: $emitted vs $expected")
      }
    }
  }

  test("source_interleave: NULL text takes the -1 sentinel hash and rank 1 (the NULL-first total order)") {
    import spark.implicits._
    // one NULL-text doc, one empty-text doc, two normal docs, one source:
    // the schedule must stay a total permutation (the window-free oracle
    // form mints DUPLICATE rank-1 rows if h is a bare NULL — the r13
    // NULL-text fuzz doc caught exactly that on the fuzz corpus)
    val docs = Seq(
      (0L, Option("plain first document"), "s1"),
      (1L, Option(""), "s1"),
      (2L, Option.empty[String], "s1"),
      (3L, Option("another plain document"), "s1"))
      .toDF("doc_id", "text", "source")
    val rows = TextOps.interleaveOf(docs).collect()
    assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq == (1L to 4L))
    val ranks = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("rank_in_source")).toMap
    assert(ranks.values.toSeq.sorted == Seq(1L, 2L, 3L, 4L),
      s"rank_in_source not a total order: $ranks")
    // the NULL-text doc hashes to the -1 sentinel, below every real
    // 32-bit hash, so it ranks FIRST in its source
    assert(ranks(2L) == 1L, s"NULL-text doc not rank 1: $ranks")
    // and the empty-string doc keeps its own REAL hash (md5('mix-v1:')
    // prefix), distinct from the sentinel
    assert(ranks(1L) != 1L || ranks(2L) != 1L)
  }

  test("global_shuffle: pos is a permutation, two-level rank equals the global rank, shards balance") {
    val rows = SparkEntry.queries("global_shuffle")(spark, sf).collect()
    // exact permutation of [0, n)
    assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq ==
      (0L until rows.length).toSeq)
    // the two-level bucket rank must equal the one-window global rank
    // it decomposes (same md5 key, same tiebreak)
    val naive = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        md5(concat(lit("epoch:1:"), col("doc_id").cast("string"))).as("k"))
      .withColumn("pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("k", "doc_id")) - lit(1L))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos"))
      .toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("pos") == naive(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}: two-level rank diverged from global")
    }
    // round-robin shard balance: counts differ by at most 1
    val shardCounts = rows.groupBy(_.getAs[Long]("shard")).map(_._2.length)
    assert(shardCounts.max - shardCounts.min <= 1,
      s"shards unbalanced: $shardCounts")
    // determinism: a second run is bit-identical (seeded permutation)
    val again = SparkEntry.queries("global_shuffle")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("span_corruption: target + corrupted input reconstruct the original") {
    val rows = SparkEntry.queries("span_corruption")(spark, sf).collect()
    assert(rows.nonEmpty)
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      // driver-side check sticks to BMP texts: Spark's substring counts
      // codepoints, Java's counts UTF-16 units
      if (t.length == t.codePointCount(0, t.length)) {
        val start = r.getAs[Long]("span_start").toInt // 1-based
        val len = r.getAs[Long]("span_len").toInt
        assert(r.getAs[String]("target_text") == t.substring(start - 1, start - 1 + len), r)
        val corrupted = t.substring(0, start - 1) + "<extra_id_0>" +
          t.substring(start - 1 + len)
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(corrupted.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(r.getAs[String]("input_md5") == md5, r)
        // splice the target back in place of the sentinel → original
        assert(corrupted.replace("<extra_id_0>",
          r.getAs[String]("target_text")) == t)
      }
    }
  }

  test("mad_outliers: medians are positional lower medians, counts recompute") {
    val rows = SparkEntry.queries("mad_outliers")(spark, sf).collect()
    assert(rows.length == 25)
    val groups = spark.sql(
      s"""SELECT n_name, CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM parquet.`$sf/customer.parquet`
          JOIN parquet.`$sf/nation.parquet` ON c_nationkey = n_nationkey
          WHERE c_acctbal IS NOT NULL""")
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).sorted }
    def lowerMedian(v: Array[Long]) = v((v.length - 1) / 2)
    rows.foreach { r =>
      val vs = groups(r.getString(0))
      val med = lowerMedian(vs)
      assert(r.getAs[Long]("med_cents") == med, r)
      val devs = vs.map(x => math.abs(x - med)).sorted
      val mad = lowerMedian(devs)
      assert(r.getAs[Long]("mad_cents") == mad, r)
      assert(r.getAs[Long]("outlier_cnt") == devs.count(_ > 3 * mad), r)
      assert(r.getAs[Long]("n_custs") == vs.length, r)
    }
  }

  test("bpe_merge_pairs: hand-checked fixtures pin argmax ties and greedy overlap") {
    import spark.implicits._
    // "the"(×2) + "then": (t,h)=3 (h,e)=3 (e,n)=1 — tie broken by l asc →
    // (h,e); then (t,he)=3; then (the,n)=1
    val m1 = TextOps.bpeMergesOf(
        Seq((1L, "the the then")).toDF("doc_id", "text"), 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(m1.toSeq == Seq((1L, "h", "e", "he", 3L),
      (2L, "t", "he", "the", 3L), (3L, "the", "n", "then", 1L)))
    // "aaaa"(×2): pair count includes overlaps (3 per word = 6) but the
    // greedy merge is non-overlapping (aaaa → aa,aa); round 3 finds no
    // pair and must STOP, not emit a phantom row
    val m2 = TextOps.bpeMergesOf(
        Seq((1L, "aaaa aaaa")).toDF("doc_id", "text"), 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(m2.toSeq == Seq((1L, "a", "a", "aa", 6L),
      (2L, "aa", "aa", "aaaa", 2L)))
  }

  test("bpe_merge_pairs: count conservation against a driver-side greedy mirror") {
    val merges = SparkEntry.queries("bpe_merge_pairs")(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(merges.length == 3)
    // independent mirror: word freqs + greedy scan merge in plain Scala
    val freqs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
      .flatMap(_.toLowerCase(java.util.Locale.ROOT).split(" ", -1))
      .filter(w => w.nonEmpty && w.matches("[a-z]+"))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    var vocab: Map[List[String], Long] =
      freqs.map { case (w, f) => w.split("").toList -> f }.toMap
        .groupBy(_._1).map { case (k, m) => k -> m.values.sum }
    def greedy(syms: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0; val a = syms.toArray
      while (i < a.length) {
        if (i + 1 < a.length && a(i) == l && a(i + 1) == r) { out += l + r; i += 2 }
        else { out += a(i); i += 1 }
      }
      out.toList
    }
    merges.foreach { case (l, r, cnt) =>
      // the reported pair_cnt is the weighted adjacent-pair count
      // (overlaps included) BEFORE the merge
      val want = vocab.toSeq.map { case (syms, f) =>
        f * syms.zip(syms.tail).count(p => p == (l, r)) }.sum
      assert(cnt == want, s"($l,$r): reported $cnt, mirror $want")
      val after = vocab.toSeq.map { case (syms, f) => greedy(syms, l, r) -> f }
        .groupBy(_._1).map { case (k, m) => k -> m.map(_._2).sum }
      // conservation: the weighted symbol total drops by exactly the
      // number of merged-symbol occurrences the round created
      def total(v: Map[List[String], Long]) =
        v.map { case (s, f) => s.length * f }.sum
      def occ(v: Map[List[String], Long], sym: String) =
        v.map { case (s, f) => s.count(_ == sym) * f }.sum
      val applied = total(vocab) - total(after)
      assert(applied == occ(after, l + r) - occ(vocab, l + r),
        s"($l,$r): applied $applied vs created ${occ(after, l + r) - occ(vocab, l + r)}")
      assert(applied >= 1, s"($l,$r): merge applied nowhere")
      vocab = after
    }
  }
}
