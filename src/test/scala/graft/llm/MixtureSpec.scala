package graft.llm

import graft.{SparkEntry, SparkSpec}

/** Apportionment invariants for mixture_allocate — the oracle gate proves
  * Spark≡DuckDB; these prove the allocation is a correct largest-remainder
  * apportionment: exact budget, caps honored, proportionality direction. */
class MixtureSpec extends SparkSpec {

  test("repeat_upsample: emits exactly one epoch budget, per-source demand honored") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("repeat_upsample")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.documents(spark, sf)
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.values.sum
    // budget conservation: the materialized list is EXACTLY one corpus
    // worth of rows, reapportioned across sources
    assert(rows.length.toLong == total, s"${rows.length} != $total")
    // per (source, doc): copy indices are dense 1..c
    rows.groupBy(r => (r.getString(0), r.getLong(1))).foreach {
      case ((src, id), copies) =>
        val idx = copies.map(_.getAs[Long]("copy_idx")).sorted
        assert(idx.toSeq == (1L to idx.length).toSeq, s"$src/$id: $idx")
    }
    // per source: total copies within corpus_docs of any doc's count ±1
    // epoch (the U div C / U mod C split), and repetition really occurs
    // for at least one over-weighted source in the fixture
    val bySource = rows.groupBy(_.getString(0)).view
      .mapValues(_.length.toLong).toMap
    val maxCopies = rows.groupBy(r => (r.getString(0), r.getLong(1)))
      .values.map(_.length).max
    assert(maxCopies >= 2, "no source actually upsampled — weights inert")
    bySource.foreach { case (src, emitted) =>
      val c = docs(src)
      val perDoc = rows.filter(_.getString(0) == src)
        .groupBy(_.getLong(1)).values.map(_.length.toLong)
      assert(perDoc.max - perDoc.min <= 1, s"$src uneven beyond the mod split")
      assert(emitted == perDoc.sum)
      // a downsampled source (U < C) emits U distinct docs once; an
      // upsampled one (U >= C) covers every doc U div C times + extras
      assert(perDoc.size <= c)
      if (emitted >= c) assert(perDoc.size.toLong == c, s"$src misses docs")
      else assert(perDoc.forall(_ == 1L), s"$src: downsampled yet repeated")
    }
  }

  test("mixture_allocate: exact budget, caps, and remainder discipline") {
    val rows = SparkEntry.queries("mixture_allocate")(spark, sf).collect()
    assert(rows.nonEmpty)
    val budget = rows.head.getAs[Long]("budget")
    // largest-remainder exactness: never off-by-rounding
    assert(rows.map(r => r.getAs[Long]("alloc_docs") +
      r.getAs[Long]("spill_docs")).sum == budget)
    rows.foreach { r =>
      val alloc = r.getAs[Long]("alloc_docs")
      val spill = r.getAs[Long]("spill_docs")
      val c = r.getAs[Long]("corpus_docs")
      assert(alloc >= 0 && spill >= 0, r)
      assert(alloc <= c, r) // a source can't contribute docs it doesn't have
      assert(spill == 0 || alloc == c, r) // spill only when the cap binds
    }
    // proportionality direction: among equal-weight sources, more corpus
    // docs never means a smaller uncapped allocation
    rows.groupBy(_.getAs[Long]("weight_milli")).values.foreach { g =>
      val byC = g.sortBy(_.getAs[Long]("corpus_docs"))
      byC.sliding(2).filter(_.length == 2).foreach { w =>
        val (a, b) = (w(0), w(1))
        val ua = a.getAs[Long]("alloc_docs") + a.getAs[Long]("spill_docs")
        val ub = b.getAs[Long]("alloc_docs") + b.getAs[Long]("spill_docs")
        assert(ua <= ub + 1, s"$a vs $b") // +1 = remainder-seat slack
      }
    }
  }
}
