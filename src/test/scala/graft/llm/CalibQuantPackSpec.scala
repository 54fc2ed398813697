package graft.llm

import graft.SparkSpec

/** Independent plain-Scala references for the round-14 trio:
  * packing_efficiency (three-strategy padding-waste audit),
  * embedding_quantize (int8 absmax PTQ error accounting), and
  * minhash_band_calib (measured-vs-analytic LSH S-curve). Each test
  * recomputes the full result from the parquet inputs with none of the
  * engine's machinery — Seq/sortBy/groupBy only — and compares rows. */
class CalibQuantPackSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ---- packing_efficiency ----

  private lazy val lens: Seq[(Long, Long)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .flatMap { r =>
        Option(r.getString(1)).map(t =>
          (r.getLong(0),
            t.toLowerCase.split(" ", -1).count(_.nonEmpty).toLong))
      }.toSeq

  private def totals(batches: Seq[Seq[Long]]): (Long, Long, Long) = {
    val real = batches.map(_.sum).sum
    val slot = batches.map(b => b.size * b.max).sum
    (batches.size.toLong, real, slot)
  }

  test("packing_efficiency matches a plain-Scala three-strategy audit") {
    val real = lens.map(_._2).sum
    val sUnits = (real + 2047) / 2048
    val stream = ("stream_pack", sUnits, real, sUnits * 2048)
    val bucketBatches = lens
      .map { case (id, n) =>
        val k = md5hex(s"lbp-v1:$id"); (n / 16, n, k.take(2), k, id)
      }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (r._2, r._3, r._4, r._5)).grouped(16)
          .map(_.map(_._2).toSeq)
      }
    val (bu, br, bs) = totals(bucketBatches)
    val naiveBatches =
      lens.sortBy(_._1).map(_._2).grouped(16).map(_.toSeq).toSeq
    val (nu, nr, ns) = totals(naiveBatches)
    val expected = Seq(
      ("bucket_batch", bu, br, bs), ("naive_batch", nu, nr, ns), stream)
      .map { case (st, u, r, sl) =>
        (st, u, r, sl, sl - r,
          if (sl == 0) null else java.lang.Long.valueOf(r * 1000 / sl))
      }
    val got = TextOps.packingEfficiency.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) null
                      else java.lang.Long.valueOf(r.getLong(5)))).toSeq
    assert(got == expected)
    // the property the key exists to show: bucketing beats naive order
    val util = got.map(r => r._1 -> r._6.longValue()).toMap
    assert(util("bucket_batch") >= util("naive_batch"))
  }

  // ---- embedding_quantize ----

  test("embedding_quantize matches a plain-Scala int8 quantizer " +
      "and respects the half-step error bound") {
    val vecs: Seq[(Long, Seq[Float])] =
      spark.read.parquet(s"$sf/embeddings.parquet")
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val expected = vecs.map { case (id, xs) =>
      val c = xs.map(x => math.floor(x.toDouble * 1000d).toLong)
      val amax = if (c.isEmpty) 0L else c.map(math.abs).max
      val q = c.map { v =>
        if (amax == 0) 0L
        else if (v >= 0) (v * 254 + amax) / (2 * amax)
        else -(((-v) * 254 + amax) / (2 * amax))
      }
      val err = c.zip(q).map { case (v, w) => v * 127 - w * amax }
      (id, amax, err.map(e => e * e).sum,
        if (err.isEmpty) 0L else err.map(math.abs).max)
    }.sortBy(_._1)
    val got = Similarity.embeddingQuantize.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // |err127| = |c·127 − q·amax| ≤ ceil(amax/2) for round-half-away
    got.foreach { case (id, amax, _, maxErr) =>
      assert(maxErr <= (amax + 1) / 2, s"vec $id err $maxErr > amax $amax/2")
    }
    // int8 range: recompute codes and check |q| ≤ 127
    vecs.foreach { case (_, xs) =>
      val c = xs.map(x => math.floor(x.toDouble * 1000d).toLong)
      val amax = if (c.isEmpty) 0L else c.map(math.abs).max
      c.foreach { v =>
        val qa = if (amax == 0) 0L else (math.abs(v) * 254 + amax) / (2 * amax)
        assert(qa <= 127)
      }
    }
  }

  // ---- minhash_band_calib ----

  private def shingles(text: String): Seq[String] =
    (1 to math.max(text.length - 7, 1)).map(i =>
      text.substring(i - 1, math.min(i + 7, text.length)))

  private def sigOf(text: String): (Seq[String], Seq[String]) = {
    val sh = shingles(text)
    val h = (0 until 4).map(j => sh.map(s => md5hex(s).substring(j * 8, j * 8 + 8)).min) ++
      (0 until 4).map(j => sh.map(s => md5hex("x" + s).substring(j * 8, j * 8 + 8)).min)
    (Seq(md5hex(h(0) + h(1) + h(2) + h(3))),
      Seq(md5hex(h(4) + h(5) + h(6) + h(7))))
  }

  test("minhash_band_calib matches a plain-Scala S-curve reference") {
    val docs: Seq[(Long, String)] =
      spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "text").collect()
        .flatMap(r => Option(r.getString(1)).map((r.getLong(0), _))).toSeq
    val div = math.max(1L, docs.size.toLong / 256L)
    val smp = docs.filter { case (id, _) =>
      java.lang.Long.parseLong(md5hex(s"mbc-v1:$id").take(8), 16) % div == 0
    }
    val sets = smp.map { case (id, t) => id -> shingles(t).toSet }.toMap
    val bands = smp.map { case (id, t) =>
      val (b0, b1) = sigOf(t); id -> (b0.head, b1.head)
    }.toMap
    val ids = smp.map(_._1).sorted
    val rows = for {
      i <- ids.indices; j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      c = (sets(a) intersect sets(b)).size.toLong
      if c > 0
    } yield {
      val u = sets(a).size.toLong + sets(b).size - c
      val caught = bands(a)._1 == bands(b)._1 || bands(a)._2 == bands(b)._2
      (math.min(9L, 10 * c / u), if (caught) 1L else 0L)
    }
    def analytic(bin: Long): Long = {
      val t = 2 * bin + 1; val t4 = t * t * t * t
      1000L * (2 * t4 * 160000L - t4 * t4) / 25600000000L
    }
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (bin, ps) =>
        val n = ps.size.toLong; val caught = ps.map(_._2).sum
        (bin, n, caught, caught * 1000 / n, analytic(bin))
      }
    val got = Dedup.minhashBandCalib.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // monotone sanity at the extremes: anything in the top bin must be
    // caught far more often than the bottom bin
    val byBin = got.map(r => r._1 -> r._4).toMap
    for (lo <- byBin.get(0L); hi <- byBin.get(9L)) assert(hi >= lo)
  }

  // ---- tokenizer_fertility ----

  test("tokenizer_fertility matches a plain-Scala re-aggregation of the " +
      "trained apply") {
    // the merge table comes from the engine's own (independently
    // spec'd + oracle-gated) trainer key; the APPLY below is plain
    // Scala — the same ',,'-encoded replace semantics BpeEncodeSpec
    // proves byte-for-byte
    val merges = TextOps.bpeMergePairs.fn(spark, sf)
      .orderBy("round").collect().map(r => (r.getString(1), r.getString(2)))
    def bpeCount(w: String): Long =
      if (w.matches("^[a-z]+$")) {
        val enc = ",," + w.flatMap(c => s"$c,,")
        val merged = merges.foldLeft(enc) { case (acc, (l, r)) =>
          acc.replace(s",$l,,$r,", s",$l$r,") }
        merged.split(",,").count(_.nonEmpty).toLong
      } else 1L
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .flatMap(r => Option(r.getString(2)).map((r.getString(1), _))).toSeq
    val expected = docs.map { case (lang, t) =>
        val ws = t.toLowerCase.split(" ", -1).filter(_.nonEmpty)
        (lang, ws.length.toLong, ws.map(bpeCount).sum)
      }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (lang, rs) =>
        val ws = rs.map(_._2).sum; val bpe = rs.map(_._3).sum
        (lang, rs.size.toLong, ws, bpe,
          if (ws == 0) null else java.lang.Long.valueOf(bpe * 1000 / ws))
      }
    val got = TextOps.tokenizerFertility.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null else java.lang.Long.valueOf(r.getLong(4))))
      .toSeq
    assert(got == expected)
  }

  // ---- shard_manifest ----

  test("shard_manifest matches a plain-Scala manifest and reconciles " +
      "with the corpus") {
    def h32(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).take(8), 16)
    val M = 2305843009213693951L // 2^61 - 1
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    val expected = docs.map { case (id, to) =>
        val ws = to.map(_.toLowerCase.split(" ", -1).count(_.nonEmpty).toLong)
          .getOrElse(0L)
        val chars = to.map(_.length.toLong).getOrElse(0L)
        (h32(s"sm-v1:$id") % 32, id, ws, chars,
          h32(s"sm-v1:$id:${to.getOrElse("")}"))
      }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (shard, rs) =>
        (shard, rs.size.toLong, rs.map(_._3).sum, rs.map(_._4).sum,
          rs.map(_._2).min, rs.map(_._2).max,
          // the engine sums in DECIMAL(38,0) then takes one mod; sum
          // of 32-bit values over a test corpus fits a Long exactly,
          // so a single trailing mod reproduces it
          rs.map(_._5).sum % M)
      }
    val got = TextOps.shardManifest.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
    // reconciliation: shard doc counts sum to the corpus row count, and
    // every doc routes to exactly one shard (counts are a partition)
    assert(got.map(_._2).sum == docs.size.toLong)
  }

  // ---- the sampled-recall pair (pq_recall_calib / quantized_topk_recall) ----

  private def h32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  /** cal-v1 sample + exact quantDot top-3 truth, recomputed plain. */
  private lazy val (calIds, calVecs, calTruth):
      (Seq[Long], Map[Long, Seq[Float]], Map[Long, Set[Long]]) = {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val div = math.max(1L, vecs.size.toLong / 4096L)
    val smp = vecs.filter { case (id, _) =>
      id < 10 || h32(s"cal-v1:$id") % div == 0 }
    val m = smp.toMap
    def qdot(a: Seq[Float], b: Seq[Float]): Long =
      a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * 1000d).toLong *
          math.floor(y.toDouble * 1000d).toLong }.sum
    val truth = smp.filter(_._1 < 10).map { case (qid, qe) =>
      qid -> smp.filter(_._1 != qid)
        .map { case (id, v) => (qdot(qe, v), id) }
        .sortBy { case (dotv, id) => (-dotv, id) }
        .take(3).map(_._2).toSet
    }.toMap
    (smp.map(_._1), m, truth)
  }

  test("quantized_topk_recall matches a plain-Scala int8 ranking " +
      "over the sampled corpus") {
    def codes(xs: Seq[Float]): (Long, Seq[Long]) = {
      val c = xs.map(x => math.floor(x.toDouble * 1000d).toLong)
      val amax = if (c.isEmpty) 0L else c.map(math.abs).max
      (amax, c.map { v =>
        if (amax == 0) 0L
        else if (v >= 0) (v * 254 + amax) / (2 * amax)
        else -(((-v) * 254 + amax) / (2 * amax))
      })
    }
    val cm = calVecs.map { case (id, v) => id -> codes(v) }
    val expected = calTruth.toSeq.sortBy(_._1).map { case (qid, truth) =>
      val (qamax, qq) = cm(qid)
      val top3 = calIds.filter(_ != qid)
        .map { id =>
          val (amax, qs) = cm(id)
          val qq8 = qq.zip(qs).map { case (a, b) => a * b }.sum
          (BigInt(qamax) * BigInt(amax) * BigInt(qq8), id)
        }
        .sortBy { case (sc, id) => (-sc, id) }.take(3).map(_._2).toSet
      (qid, 3L, (top3 & truth).size.toLong,
        (top3 & truth).size.toLong * 1000 / 3)
    }
    val got = Similarity.quantizedTopkRecall.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  test("pq_recall_calib matches a plain-Scala PQ pipeline " +
      "over the sampled corpus") {
    // plain-Scala PQ: seed codebook = 16 smallest sampled vec_ids,
    // 16-dim subspaces, squared-distance encode, ADC scores, top-5
    def comp(v: Seq[Float]): Seq[Long] =
      v.map(x => math.floor(x.toDouble * 1000d).toLong)
    val seeds = calIds.sorted.take(16)
    val dims = seeds.flatMap(s => calVecs(s).indices).distinct.sorted
    // zero-filled seed grid over the union of seed dims
    val cent: Map[Int, Map[Int, Long]] = seeds.zipWithIndex.map {
      case (sid, slot) =>
        val c = comp(calVecs(sid))
        slot -> dims.map(d => d -> (if (d < c.size) c(d) else 0L)).toMap
    }.toMap
    def subScores(v: Seq[Long]): Map[(Int, Int), Seq[Long]] = {
      // (sub, ·) -> per-slot Σ (q − c)² over this vector's dims ∩ grid
      val bySub = v.indices.filter(dims.contains)
        .groupBy(d => d / 16)
      bySub.map { case (sub, ds) =>
        (sub, 0) -> cent.keys.toSeq.sorted.map { slot =>
          ds.map(d => { val diff = v(d) - cent(slot)(d); diff * diff }).sum
        }
      }
    }
    def encode(v: Seq[Long]): Map[Int, Int] =
      subScores(v).map { case ((sub, _), ss) =>
        sub -> ss.zipWithIndex.minBy { case (s2, slot) => (s2, slot) }._2 }
    val allCodes = calIds.map(id => id -> encode(comp(calVecs(id)))).toMap
    val expected = calTruth.toSeq.sortBy(_._1).map { case (qid, truth) =>
      val qs = subScores(comp(calVecs(qid)))
        .map { case ((sub, _), ss) => sub -> ss }
      val top5 = calIds.filter(_ != qid)
        .flatMap { id =>
          // ADC: an inner join on (sub, code) — a candidate scores only
          // where BOTH the query table and its codes cover the sub; no
          // overlap at all = no score row = excluded from the ranking
          val subs = allCodes(id).keySet & qs.keySet
          if (subs.isEmpty) None
          else Some((subs.toSeq.map(s => qs(s)(allCodes(id)(s))).sum, id))
        }
        .sortBy { case (ad, id) => (ad, id) }.take(5).map(_._2).toSet
      val hits = (top5 & truth).size.toLong
      (qid, 3L, hits, hits * 1000 / 3)
    }
    val got = Similarity.pqRecallCalib.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // the pair tells the compression story together: near-lossless
    // int8 per-vector codes vs the coarse 16-centroid PQ
    val q8 = Similarity.quantizedTopkRecall.fn(spark, sf).collect()
      .map(r => r.getLong(3)).sum
    assert(q8 >= got.map(_._4).sum,
      "int8 per-vector recall should dominate 16-centroid PQ recall")
  }
}
