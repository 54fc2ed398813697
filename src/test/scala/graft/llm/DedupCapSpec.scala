package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The loud group-size cap on the pair-listing emitters (VERDICT r18
  * task 3): a near-dup group of g members contracts a g(g−1)/2-row pair
  * emit, so past `spark.graft.dedup.maxGroupMembers` the job must FAIL
  * with the offending group named — a 10M-doc boilerplate group at web
  * scale implies ~5·10¹³ pairs nobody wants materialized — while below
  * the cap the output is byte-identical to the unguarded plan (the
  * 168-key oracle gate pins that half; this spec pins the cap half on a
  * synthetic oversized group for BOTH emitters). */
class DedupCapSpec extends SparkSpec {
  lazy val s = spark
  import s.implicits._

  private val CONF = "spark.graft.dedup.maxGroupMembers"

  /** 6 identical boilerplate docs (one hot group) + 2 unrelated docs. */
  private def corpus: DataFrame = {
    val hot = "the same boilerplate navigation header text repeated on " +
      "every page of the crawl with enough words to shingle properly"
    val rows = (0L until 6L).map(i => (i, hot)) ++ Seq(
      (100L, "a completely different document about alpha beta gamma"),
      (200L, "another unrelated text mentioning delta epsilon zeta"))
    rows.toDF("doc_id", "text")
  }

  private def withCap[T](cap: String)(body: => T): T =
    try { s.conf.set(CONF, cap); body } finally s.conf.unset(CONF)

  test("minhash pair emit fails loudly past the group cap, named group") {
    val e = intercept[Exception] {
      withCap("4")(Dedup.candidatePairsOf(corpus).count())
    }
    val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msg.contains("dedup_minhash"), msg)
    assert(msg.contains("members (> cap 4)"), msg)
    assert(msg.contains("band"), msg)
  }

  test("minhash pair emit is unchanged below the cap") {
    // 6-member identical-text group => C(6,2) = 15 pairs; the two
    // unrelated docs share no band with anything
    val got = withCap("64")(Dedup.candidatePairsOf(corpus).collect())
    assert(got.length == 15)
    assert(got.forall(r => r.getLong(0) < 6 && r.getLong(1) < 6))
  }

  test("simhash pair emit fails loudly past the group cap, named group") {
    val sig = Dedup.simhashSignatures(corpus).localCheckpoint(false)
    val e = intercept[Exception] {
      withCap("4")(Dedup.simhashPairsOf(sig).count())
    }
    val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msg.contains("simhash_hamming_pairs"), msg)
    assert(msg.contains("members (> cap 4)"), msg)
    assert(msg.contains("simhash="), msg)
  }

  test("simhash pair emit keeps the hamming-0 group below the cap") {
    val sig = Dedup.simhashSignatures(corpus).localCheckpoint(false)
    val got = withCap("64")(Dedup.simhashPairsOf(sig).collect())
    val zero = got.filter(_.getLong(2) == 0L)
    // the 6 identical docs share one signature: all 15 hamming-0 pairs
    assert(zero.count(r => r.getLong(0) < 6 && r.getLong(1) < 6) == 15)
  }
}
