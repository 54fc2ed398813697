package graft.ops

import graft.QuerySpec
import graft.Tables._
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators — the 100 TB cardinality/quantile answer.
  *
  * The reference computes exact COUNT(DISTINCT) and exact quantiles in
  * SQLite (BusinessAnalysis.Rmd:190-195, 525-526); at warehouse scale the
  * same questions are answered with MERGEABLE sketches: per-partition
  * (per-day, per-file) partials that union associatively, so yesterday's
  * materialized sketch never re-scans yesterday's data. These two keys
  * prove that architecture end-to-end AND pin its accuracy contract
  * against the exact oracle — the estimate must land inside the published
  * error bound, and the bound check itself is the hash-matched output
  * (the sketch value is an implementation detail; the contract is the
  * bound).
  */
object Sketches {

  /** Two-level HLL: daily per-event_type sketches of user_id (the shape
    * you'd materialize per ingest batch at 100 TB), then hll_union_agg to
    * the event_type total — never a re-scan of raw rows at merge time.
    * Datasketches HLL at lgConfigK=12 has ~1.6% relative standard error;
    * `hll_ok` asserts the estimate is within 5% of exact (3σ + slack).
    * The exact branch exists only as the calibration witness — the
    * production query drops it and keeps the sketch path.
    *
    * Scale shape: stage 1 is a map-side-combinable agg on (event_type,
    * day) — partials are 4 KB sketch buffers, not row sets; stage 2
    * shuffles only |types|×|days| sketches. The exact witness shuffles
    * (event_type, user_id) once — the cost the sketch path avoids. */
  val hllMergeable = QuerySpec(
    "hll_mergeable",
    (s, d) => {
      val ev = events(s, d)
      val daily = ev
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("day_sketch"))
      val merged = daily
        .groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("day_sketch")))
          .as("hll_users"))
      val exact = ev.groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("exact_users"))
      exact.join(merged, Seq("event_type"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("hll_users") - col("exact_users")) <=
            col("exact_users") * lit(0.05)).as("hll_ok"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
                   TRUE AS hll_ok
            FROM events GROUP BY event_type ORDER BY event_type""")
  )

  /** Quantile-sketch calibration: approx_percentile (Greenwald-Khanna,
    * accuracy 10000 ⇒ rank error ≤ 0.01 %) median of `value` per
    * event_type, validated by its RANK, not its value: the exact count of
    * rows ≤ the sketch's median must sit within ±2 % of n/2. Rank is the
    * right contract — GK guarantees rank error, and the flag stays
    * deterministic even though the sketch's chosen element may vary with
    * partition merge order (which is why the sketch value itself is NOT
    * an output column).
    *
    * Scale shape: one map-side-combinable GK agg per group (log-sized
    * summaries merge associatively, same mergeable-partial architecture
    * as [[hllMergeable]]), then one broadcast of |types| medians back
    * over the rows for the witness count — the production query drops
    * the witness scan. */
  val quantileCalib = QuerySpec(
    "quantile_sketch_calib",
    (s, d) => {
      val ev = events(s, d).select(col("event_type"), col("value"))
      val med = ev.groupBy("event_type")
        .agg(approx_percentile(col("value"), lit(0.5), lit(10000))
          .as("approx_med"))
      ev.join(broadcast(med), Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") <= col("approx_med"), 1L).otherwise(0L))
            .as("rank_at_med"))
        .select(col("event_type"), col("n"),
          // +1 absolute slack: at the exact end (small n, GK returns the
          // true median) rank_at_med = ceil(n/2), a fixed 0.5 off n/2
          (abs(col("rank_at_med") - col("n") / lit(2.0)) <=
            col("n") * lit(0.02) + lit(1.0)).as("rank_ok"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n, TRUE AS rank_ok
            FROM events GROUP BY event_type ORDER BY event_type""")
  )

  val all: Seq[QuerySpec] = Seq(hllMergeable, quantileCalib)
}
