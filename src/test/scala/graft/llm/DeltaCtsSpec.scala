package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** delta_corpus_to_shards — the incremental export composition. Under
  * test, on the real sf0.001 corpus:
  *  (1) ⊕-equivalence: the key's manifest UPDATE (stored corpus
  *      manifest ⊕ delta manifest, two independent aggregations
  *      combined) equals the manifest computed FROM SCRATCH in ONE
  *      aggregation over the union of the selected corpus docs and the
  *      admitted shard docs — the shard-parallel-writer associativity
  *      shard_manifest asserts, here exercised across a real delta;
  *  (2) bin disjointness: the append starts at the next EMPTY bin, so
  *      no delta doc shares a pack bin with a stored doc (the property
  *      that makes start_bins additive, and the reason a delta never
  *      rewrites an already-shipped pack file);
  *  (3) frozen-quota accounting: per source, the admitted count is
  *      exactly min(headroom, shard survivors) where headroom =
  *      max(0, union-allocation − frozen corpus selection) — the
  *      incremental mixture rule, recomputed here from the stored
  *      per-source counts and the shared apportionment algebra.
  */
class DeltaCtsSpec extends SparkSpec {

  private lazy val state = TextOps.ctsCorpusState(spark, sf)
  private lazy val adm: DataFrame =
    TextOps.deltaAdmittedOf(spark, sf).localCheckpoint()

  test("stored ⊕ delta manifest == one-shot manifest over the selected union") {
    val (survIdx, _) = state
    val docs = graft.Tables.documents(spark, sf)
    val selC = docs
      .join(survIdx.filter(col("bin_id").isNotNull)
        .select("doc_id", "bin_id"), Seq("doc_id"))
      .select("doc_id", "text", "bin_id")
    val union = selC.unionByName(adm.select("doc_id", "text", "bin_id"))
      .localCheckpoint()
    val oneShot = TextOps.manifestAggOf(
        TextOps.manifestRowsOf(union.select("doc_id", "text")),
        union.select("doc_id", "bin_id"))
      .orderBy("shard")
      .collect().map(_.toSeq).toSeq
    val combined = graft.SparkEntry.queries("delta_corpus_to_shards")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(combined.nonEmpty, "delta manifest update came back empty")
    assert(combined == oneShot,
      s"⊕ combine diverges from the one-shot union manifest:\n" +
        s"combined=$combined\noneShot=$oneShot")
  }

  test("delta bins start past every stored bin (append never rewrites a shipped bin)") {
    val (survIdx, _) = state
    val maxStored = survIdx.agg(max(col("bin_id"))).first()
    val minDelta = adm.agg(min(col("bin_id"))).first()
    assert(!minDelta.isNullAt(0), "no admitted shard docs at sf0.001 — " +
      "the spec corpus should admit some; check the quota chain")
    assert(!maxStored.isNullAt(0) &&
      maxStored.getLong(0) < minDelta.getLong(0),
      s"delta bin ${minDelta.getLong(0)} does not clear the stored " +
        s"max bin ${maxStored.getLong(0)}")
  }

  test("per source, admitted == min(union-alloc headroom, shard survivors)") {
    val (survIdx, _) = state
    val survS = TextOps.deltaShardSurvivorsOf(spark, sf).localCheckpoint()
    def bySrc(df: DataFrame): Map[String, Long] =
      df.groupBy("source").agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nSurvC = bySrc(survIdx)
    val nSurvS = bySrc(survS)
    val nSelC = bySrc(survIdx.filter(col("bin_id").isNotNull))
    val cnts = (nSurvC.keySet ++ nSurvS.keySet).toSeq
      .map(s => (s, nSurvC.getOrElse(s, 0L) + nSurvS.getOrElse(s, 0L)))
    import spark.implicits._
    val alloc = TextOps.mixtureAllocFromCounts(
        cnts.toDF("source", "corpus_docs"), 2)
      .select("source", "alloc_docs").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val admBySrc = bySrc(adm.join(survS.select("doc_id", "source"),
      Seq("doc_id")))
    val expected = alloc.map { case (s, a) =>
      s -> math.min(math.max(0L, a - nSelC.getOrElse(s, 0L)),
        nSurvS.getOrElse(s, 0L))
    }.filter(_._2 > 0)
    assert(admBySrc == expected,
      s"admitted counts $admBySrc != frozen-quota headroom $expected")
  }
}
