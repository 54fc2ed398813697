package graft.ops

import graft.QuerySpec
import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Behavioral-analytics operators over the order/event history — the
  * retention, affinity and sequence questions the reference's analytics
  * layer (BusinessAnalysis.Rmd:79-533's revenue/customer summaries) stops
  * just short of, and the first things a media-sales warehouse asks next.
  *
  * All three follow the repo's determinism conventions: exact integer
  * outputs (ppm ratios via DECIMAL(38,0)/HUGEINT floor division, never
  * doubles), total-order `orderBy`, and the never-statically-broadcast
  * rule for corpus-derived frames.
  */
object Behavior {

  /** Cohort retention: customers grouped by first-purchase month, then
    * for each (cohort month, months since cohort) the count of cohort
    * members active in that month.
    *
    * Scale shape: ONE corpus shuffle. The naive plan aggregates first
    * orders per customer and joins them back to the order scan — two
    * shuffles of the fact table on o_custkey. Instead one groupBy
    * produces both the cohort month (min) and the customer's distinct
    * active months (collect_set, bounded by the calendar — ≤ ~100 entries
    * per customer regardless of order count), and the explode lands on
    * the config-bounded (cohort × month) grid. At 100 TB the second
    * aggregation's key space is |months|² ≈ 10⁴ rows — map-side combine
    * collapses it before the shuffle. */
  val cohortRetention = QuerySpec(
    "cohort_retention",
    (s, d) => {
      val om = orders(s, d).select(col("o_custkey"),
        date_trunc("month", col("o_orderdate")).as("om"))
      om.groupBy("o_custkey")
        .agg(min(col("om")).as("cohort"), collect_set(col("om")).as("ms"))
        .select(col("cohort"), explode(col("ms")).as("om"))
        .groupBy(
          date_format(col("cohort"), "yyyy-MM").as("cohort_month"),
          months_between(col("om"), col("cohort")).cast(LongType)
            .as("months_since"))
        .agg(count(lit(1)).as("active_customers"))
        .orderBy("cohort_month", "months_since")
    },
    Some("""WITH om AS (
              SELECT o_custkey, date_trunc('month', o_orderdate) AS om
              FROM orders),
            f AS (SELECT o_custkey, MIN(om) AS cohort FROM om GROUP BY 1)
            SELECT strftime(f.cohort, '%Y-%m') AS cohort_month,
                   CAST(datediff('month', f.cohort, om.om) AS BIGINT)
                     AS months_since,
                   CAST(COUNT(DISTINCT om.o_custkey) AS BIGINT)
                     AS active_customers
            FROM om JOIN f USING (o_custkey)
            GROUP BY 1, 2 ORDER BY cohort_month, months_since""")
  )

  /** Market-basket affinity: part pairs co-purchased in the same order,
    * with co-occurrence count and lift (obs/expected under independence)
    * in exact ppm.
    *
    * Scale shape: pair generation is per-basket via higher-order array
    * functions after ONE groupBy — fan-out is bounded by basket size
    * squared, never corpus-squared, and a `raise_error` cap (the repo's
    * loud-cap discipline, Dedup.scala cc cap) fails the job if a basket
    * exceeds 256 distinct parts instead of silently fanning out. The
    * (order, part) frame is pinned once for its three consumers (pairs,
    * per-part support, order total); support joins carry shuffle_hash
    * hints (corpus-derived — the never-statically-broadcast rule); the
    * 1-row total is the sanctioned broadcast. Lift rides DECIMAL(38,0) /
    * HUGEINT: pair·total·10⁶ overflows BIGINT at warehouse row counts. */
  /** Per-basket pair fan-out with the loud cap — factored out so the cap
    * path is spec-testable on a synthetic oversized basket. */
  private[graft] def basketPairsOf(
      op: org.apache.spark.sql.DataFrame, cap: Int = 256)
      : org.apache.spark.sql.DataFrame =
    op.groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .withColumn("ps",
        when(size(col("ps")) <= lit(cap), col("ps"))
          .otherwise(raise_error(concat(
            lit("basket_affinity: order "), col("l_orderkey"),
            lit(s" exceeds the $cap-distinct-part basket cap")))))
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          y => struct(x.as("p1"), y.as("p2"))))))
        .as("pr"))
      .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .agg(count(lit(1)).as("pair_orders"))

  val basketAffinity = QuerySpec(
    "basket_affinity",
    (s, d) => {
      val op = lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
        .localCheckpoint(false)
      val support = op.groupBy("l_partkey").agg(count(lit(1)).as("n"))
      val tot = op.agg(count_distinct(col("l_orderkey")).as("t"))
      val pairs = basketPairsOf(op).filter(col("pair_orders") >= 2)
      pairs
        .join(support.select(col("l_partkey").as("p1"), col("n").as("n1"))
          .hint("shuffle_hash"), Seq("p1"))
        .join(support.select(col("l_partkey").as("p2"), col("n").as("n2"))
          .hint("shuffle_hash"), Seq("p2"))
        .crossJoin(broadcast(tot))
        .select(col("p1"), col("p2"), col("pair_orders"),
          expr("""cast((cast(pair_orders as decimal(38,0)) * t * 1000000)
                  div (cast(n1 as decimal(38,0)) * n2) as bigint)""")
            .as("lift_ppm"))
        .orderBy("p1", "p2")
    },
    Some("""WITH op AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            pc AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n
                   FROM op GROUP BY 1),
            tot AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS t
                    FROM op),
            pr AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                          CAST(COUNT(*) AS BIGINT) AS pair_orders
                   FROM op a JOIN op b
                     ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
                   GROUP BY 1, 2 HAVING COUNT(*) >= 2)
            SELECT pr.p1, pr.p2, pr.pair_orders,
                   CAST((CAST(pr.pair_orders AS HUGEINT) * tot.t * 1000000)
                        // (CAST(ca.n AS HUGEINT) * cb.n) AS BIGINT)
                     AS lift_ppm
            FROM pr CROSS JOIN tot
            JOIN pc ca ON ca.l_partkey = pr.p1
            JOIN pc cb ON cb.l_partkey = pr.p2
            ORDER BY p1, p2""")
  )

  /** First-order Markov transition matrix over per-user event sequences:
    * consecutive (event_type → next event_type) bigram counts and the
    * per-source transition probability in exact ppm.
    *
    * Scale shape: the lead() window partitions by user_id — state is one
    * user's events, skew bounded by the hottest user (the same contract
    * as event_sessions); the transition frame is |types|² ≈ config-sized,
    * so its per-source normalizing window is free. The (ts, event_id)
    * sort key is a TOTAL order per user — ts alone would leave same-µs
    * bigrams engine-dependent. */
  val markovTransitions = QuerySpec(
    "markov_transitions",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val tr = events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("dst", lead(col("event_type"), 1).over(w))
        .filter(col("dst").isNotNull)
        .groupBy(col("event_type").as("src"), col("dst"))
        .agg(count(lit(1)).as("transitions"))
      tr.withColumn("src_total",
          sum(col("transitions")).over(Window.partitionBy("src")))
        .select(col("src"), col("dst"), col("transitions"),
          expr("""cast(cast(transitions as decimal(38,0)) * 1000000
                  div src_total as bigint)""").as("prob_ppm"))
        .orderBy("src", "dst")
    },
    Some("""WITH seq AS (
              SELECT user_id, event_type,
                     LEAD(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS dst
              FROM events),
            tr AS (SELECT event_type AS src, dst,
                          CAST(COUNT(*) AS BIGINT) AS transitions
                   FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2)
            SELECT src, dst, transitions,
                   CAST(CAST(transitions AS HUGEINT) * 1000000
                        // SUM(transitions) OVER (PARTITION BY src)
                     AS BIGINT) AS prob_ppm
            FROM tr ORDER BY src, dst""")
  )

  val all: Seq[QuerySpec] =
    Seq(cohortRetention, basketAffinity, markovTransitions)
}
