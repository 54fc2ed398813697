package graft

import org.apache.spark.sql.functions._

/** Skew-shaped twin of a ScaleData replica corpus, for SKEW_SCALE: the
  * replica corpora test VOLUME (uniform k× of everything) but every
  * distribution stays as flat as the base — no hot key, no hot near-dup
  * group, no dominant source. At 100 TB the failure mode that volume
  * testing misses is SKEW: one boilerplate page duplicated across a
  * crawl, one source contributing a quarter of the corpus, one user or
  * one item behind a quarter of the events. This generator rewrites a
  * uniform scaled corpus with exactly those shapes while holding every
  * ROW COUNT identical, so a bench ratio skew/uniform isolates the
  * distribution change from data volume.
  *
  * Skew shapes (all deterministic — md5/pmod routing, no RNG):
  *  - documents: one HOT NEAR-DUP GROUP — 10% of all docs get the text
  *    of one deterministically-chosen base doc (hamming-0 partners;
  *    the group the simhash exact-collapse and the minhash/ngram
  *    candidate bounds exist for), and one HOT SOURCE — 25% of docs
  *    re-labeled to a single source value (stresses groupBy/source
  *    aggregates and the mixture/interleave keys).
  *  - events: one HOT USER — 25% of all events re-keyed to one user_id
  *    (a window PARTITION BY user_id now has a partition holding a
  *    quarter of the corpus — the sessionization/funnel skew case).
  *  - lineitem: one HOT PART — 25% of all lines re-keyed to one
  *    l_partkey (a hot graph node for the co-occurrence/triangle keys,
  *    a genuine heavy hitter for the sketch keys, a skewed join key for
  *    the part-side joins).
  * Everything else copies verbatim (FKs still resolve: the hot ids are
  * chosen FROM the existing key domain).
  *
  * Usage: sbt "runMain graft.SkewData tmpdata/sf0.5x tmpdata/sf0.5skew"
  * then   SPARK_GRAFT_SF_DIR=tmpdata/sf0.5skew \
  *          SPARK_GRAFT_BENCH_KEYS=... sbt "runMain graft.Bench"
  * and    python3 tools/skew_scale.py ... -> SKEW_SCALE.json
  */
object SkewData {

  /** Deterministic p%-of-rows selector on a key column: crc32 of the
    * md5 hex of salt+key, mod 100 — stable across runs and engines.
    * The salt keeps different skew dimensions INDEPENDENT: without it,
    * a 10% selector is a strict subset of a 25% selector on the same
    * key (same hash, nested thresholds), which would fully correlate
    * the hot-near-dup and hot-source document shapes. */
  private def pick(keyCol: String, pct: Int, salt: String) =
    pmod(crc32(md5(concat(lit(salt), col(keyCol).cast("string")))),
         lit(100)) < lit(pct)

  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("tmpdata/sf0.5x")
    val outDir = args.lift(1).getOrElse("tmpdata/sf0.5skew")
    val spark = Harness.session()

    // ---- documents: hot near-dup group (10%) + hot source (25%) ----
    val docs = Tables.documents(spark, inDir)
    // the hot text: the longest text among the 16 lowest base doc_ids —
    // deterministic, and long enough to shingle/fingerprint like a real
    // boilerplate page (a 1-word hot doc would vacuously skip the
    // shingle-based keys)
    val hotText = docs.orderBy("doc_id").limit(16)
      .orderBy(length(col("text")).desc, col("doc_id"))
      .select("text").first().getString(0)
    docs.select(
        col("doc_id"),
        when(pick("doc_id", 10, "nd-v1:"), lit(hotText)).otherwise(col("text"))
          .as("text"),
        col("lang"),
        when(pick("doc_id", 25, "src-v1:"), lit("hot_source"))
          .otherwise(col("source")).as("source"),
        when(pick("doc_id", 10, "nd-v1:"), lit(hotText.length).cast("long"))
          .otherwise(col("n_chars")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    println(s"[skewdata] documents: 10% hot near-dup group + 25% hot source")

    // ---- events: hot user (25% of events) ----
    val ev = Tables.events(spark, inDir)
    val hotUser = ev.agg(min(col("user_id"))).first().getLong(0)
    ev.withColumn("user_id",
        when(pick("event_id", 25, "usr-v1:"), lit(hotUser))
          .otherwise(col("user_id")))
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    println(s"[skewdata] events: 25% re-keyed to hot user $hotUser")

    // ---- lineitem: hot part (25% of lines) ----
    val li = Tables.lineitem(spark, inDir)
    val hotPart = li.agg(min(col("l_partkey"))).first().getLong(0)
    li.withColumn("l_partkey",
        // the selector keys on the LINE identity (orderkey, linenumber),
        // not the part, so exactly ~25% of lines move wherever they were
        when(pmod(crc32(md5(concat_ws("|", col("l_orderkey"),
          col("l_linenumber")))), lit(100)) < lit(25), lit(hotPart))
          .otherwise(col("l_partkey")))
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    println(s"[skewdata] lineitem: 25% re-keyed to hot part $hotPart")

    // ---- everything else: verbatim copies ----
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "embeddings").foreach { t =>
      spark.read.parquet(s"$inDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    println(s"""{"skewdata":"$outDir","base":"$inDir"}""")
    spark.stop()
  }
}
