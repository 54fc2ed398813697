package graft.llm

import graft.{SparkEntry, SparkSpec}

/** Apportionment invariants for mixture_allocate — the oracle gate proves
  * Spark≡DuckDB; these prove the allocation is a correct largest-remainder
  * apportionment: exact budget, caps honored, proportionality direction. */
class MixtureSpec extends SparkSpec {

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
