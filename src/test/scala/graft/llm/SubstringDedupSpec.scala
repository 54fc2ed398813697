package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** substring_dedup — the exact duplicated-span tier. Contract under
  * test: a planted cross-document verbatim span is recovered at its
  * FULL extent (not a sample), intra-document repetition does not
  * count, sub-k-length docs and overlaps are handled, and the shipped
  * plan agrees with a driver-side brute force on random corpora.
  */
class SubstringDedupSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  // contexts draw from disjoint alphabets so no 50-gram can straddle a
  // context/span boundary in two docs at once
  private val span200 = ("the quick brown fox jumps over the lazy dog 01234 " * 4).take(200)
  private val ctxA = "AAAAABBBBBCCCCCDDDDDEEEEEFFFFFGGGGGHHHHH".take(37)
  private val ctxB = "ZZZZZYYYYYXXXXXWWWWWVVVVVUUUUUTTTTTSSSSS"

  test("a planted 200-char cross-doc span is recovered at full extent in both docs") {
    val docs = Seq(
      (1L, ctxA + span200 + ctxB),
      (2L, ctxB + ctxB + span200 + ctxA)).toDF("doc_id", "text")
    val got = Dedup.substringDedupOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq == Seq(
      (1L, ctxA.length + 1L, 200L),
      (2L, 2L * ctxB.length + 1L, 200L)), got.toSeq.toString)
  }

  test("intra-doc repetition is NOT duplication: a span repeated twice in one doc yields nothing") {
    val rep = span200.take(80)
    val docs = Seq(
      (1L, ctxA + rep + ctxB + rep + ctxA),
      (2L, ctxB * 4)).toDF("doc_id", "text")
    assert(Dedup.substringDedupOf(docs).count() == 0)
  }

  test("docs shorter than k are excluded; a minimal shared 50-gram reports span_len exactly 50") {
    val g50 = span200.take(50)
    val docs = Seq(
      (1L, "tiny"),
      (2L, ctxA + g50 + ctxB.take(13)),
      (3L, ctxB + g50)).toDF("doc_id", "text")
    val got = Dedup.substringDedupOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq == Seq(
      (2L, ctxA.length + 1L, 50L),
      (3L, ctxB.length + 1L, 50L)), got.toSeq.toString)
  }

  test("generative: agrees with a driver-side brute force on random 2-letter corpora (k=8)") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 4) {
      val docs = (0L until 12L).map { id =>
        val len = rnd.nextInt(120)
        (id, Seq.fill(len)(if (rnd.nextBoolean()) 'a' else 'b').mkString)
      }
      val k = 8
      // brute force: duplicated positions = gram also present in another doc
      val grams = docs.flatMap { case (id, t) =>
        (0 to t.length - k).map(i => (t.substring(i, i + k), id, i + 1L))
      }
      val byGram = grams.groupBy(_._1).view
        .mapValues(_.map(_._2).distinct.size).toMap
      val dup = grams.filter { case (g, _, _) => byGram(g) >= 2 }
        .map { case (_, id, i) => (id, i) }.toSet
      val expect = docs.flatMap { case (id, t) =>
        val ps = (1L to (t.length - k + 1).toLong).filter(i => dup((id, i)))
        // fold sorted positions into maximal runs
        ps.foldLeft(List.empty[(Long, Long)]) {
          case ((s0, e0) :: rest, i) if i == e0 + 1 => (s0, i) :: rest
          case (acc, i) => (i, i) :: acc
        }.map { case (s0, e0) => (id, s0, e0 - s0 + k) }
      }.sorted
      val got = Dedup.substringDedupOf(docs.toDF("doc_id", "text"), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
      assert(got == expect, s"trial $trial: got $got expected $expect")
    }
  }
}
