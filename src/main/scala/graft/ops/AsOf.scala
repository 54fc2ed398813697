package graft.ops

import graft.Tables._
import graft.QuerySpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the classic time-series
  * operator Spark has no native form of (SURVEY §2.10 extension; the
  * reference's batch SQL never needed it, a streaming/attribution
  * pipeline immediately does).
  *
  * Implemented as the SCALABLE sort-merge shape rather than the naive
  * fan-out: tag the right rows, union both sides, sort within each key
  * partition by (time, side, tie), and carry the last non-null right
  * attributes forward with a window. Cost: ONE shuffle on the join key +
  * one sort — identical to a single groupBy — and state per row is O(1).
  * The naive formulation (equi-join on key, filter time, rank, prune)
  * materializes every (left, right) candidate pair per key first, which
  * at 100 TB explodes on active keys; this shape never does.
  *
  * Tie semantics are pinned for cross-engine determinism (DuckDB's
  * native ASOF JOIN leaves equal-timestamp winners unspecified, so the
  * oracle uses the same window formulation): right rows sort BEFORE left
  * rows at equal times (>= as-of semantics — a right row at exactly the
  * left time matches), and among right rows with equal times the larger
  * tie-break value wins.
  */
object AsOf {

  /** Left rows + `asof_<c>` columns carrying the most recent (by `time`,
    * at-or-before) right values per `key`. Rows with no prior right row
    * get nulls. `tieBreak` must be one of `valueCols`. */
  def asOfJoin(left: DataFrame, right: DataFrame,
               key: String, time: String,
               valueCols: Seq[String], tieBreak: String): DataFrame = {
    require(valueCols.contains(tieBreak), "tieBreak must be a valueCol")
    val rightTagged = right.select(
      col(key) +: col(time) +: lit(0L).as("__tag") +:
        valueCols.map(c => col(c).as(s"__r_$c")): _*)
    val leftTagged = left.withColumn("__tag", lit(1L))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(time), col("__tag"), col(s"__r_$tieBreak").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__tag") === 1L)
      .drop("__tag" +: valueCols.map(c => s"__r_$c"): _*)
  }

  /** Attribution: every event joined as-of to the same user's most
    * recent purchase. Lag is exact integer microseconds on the shared
    * ns→µs-truncated time base (Tables.events / epoch_ns//1000 — no
    * float seconds, no rounding divergence). */
  val asofAttribution = QuerySpec(
    "asof_attribution",
    (s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      asOfJoin(ev, purchases, "user_id", "ts",
          Seq("purchase_id", "purchase_ts"), "purchase_id")
        .select(col("event_id"), col("user_id"), col("event_type"),
          coalesce(col("asof_purchase_id"), lit(-1L)).as("purchase_id"),
          when(col("asof_purchase_id").isNotNull,
            unix_micros(col("ts")) - unix_micros(col("asof_purchase_ts")))
            .otherwise(lit(-1L)).as("lag_us"))
        .orderBy("event_id")
    },
    Some("""WITH u AS (
              SELECT user_id, ts, 1 AS tag, event_id, event_type,
                     NULL::BIGINT AS p_id, NULL::TIMESTAMP_NS AS p_ts
              FROM events
              UNION ALL
              SELECT user_id, ts, 0, NULL, NULL, event_id, ts
              FROM events WHERE event_type = 'purchase'),
            c AS (
              SELECT *,
                     last_value(p_id IGNORE NULLS) OVER w AS a_id,
                     last_value(p_ts IGNORE NULLS) OVER w AS a_ts
              FROM u
              -- order on the µs-TRUNCATED time, matching Spark's ns→µs
              -- time base: raw TIMESTAMP_NS ordering would tie-break
              -- equal-after-truncation rows differently across engines
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY epoch_ns(ts) // 1000, tag, p_id ASC NULLS FIRST
                           ROWS UNBOUNDED PRECEDING))
            SELECT event_id, user_id, event_type,
                   COALESCE(a_id, -1) AS purchase_id,
                   CASE WHEN a_id IS NULL THEN -1
                        ELSE epoch_ns(ts) // 1000 - epoch_ns(a_ts) // 1000
                   END AS lag_us
            FROM c WHERE tag = 1 ORDER BY event_id""")
  )

  /** Bucket-accelerated range (band) join — Spark plans a raw
    * `lo <= v AND v < hi` join as BroadcastNestedLoopJoin, which is a
    * per-row scan of every band; fine for a 4-row dim, catastrophic when
    * the band table grows (tiered pricing, histogram bins, geo ranges).
    * The scale shape: quantize both sides to a bucket grid — each band
    * explodes to the buckets it spans, each fact computes one bucket —
    * and the range join becomes an EQUI-join on the bucket plus a
    * residual filter. Hash join, shuffle-or-broadcast by bucket, no
    * nested loop. Bounds are integer cents so the residual compare is
    * exact in both engines. */
  def rangeBandJoin(facts: DataFrame, valueCentsCol: String,
                    bands: DataFrame /* (band, lo_cents, hi_cents) */,
                    bucketCents: Long): DataFrame = {
    // integer `div`, not `/`: Column./ on longs widens to double
    val bandBuckets = bands.select(col("band"), col("lo_cents"), col("hi_cents"),
      explode(sequence(expr(s"lo_cents div $bucketCents"),
        expr(s"(hi_cents - 1) div $bucketCents"))).as("__bucket"))
    facts
      .withColumn("__bucket", expr(s"$valueCentsCol div $bucketCents"))
      .join(broadcast(bandBuckets), Seq("__bucket"))
      .filter(col(valueCentsCol) >= col("lo_cents") &&
              col(valueCentsCol) < col("hi_cents"))
      .drop("__bucket", "lo_cents", "hi_cents")
  }

  /** Band the event values into pricing tiers and aggregate per
    * (band, event_type) — the equi-ized range join under the oracle gate
    * (DuckDB side states the range join directly as inequality
    * predicates; same result, different physical shape). */
  val rangeBand = QuerySpec(
    "range_band_join",
    (s, d) => {
      val bands = s.createDataFrame(Seq(
        ("micro", 0L, 1000L),        // [$0, $10)
        ("small", 1000L, 5000L),     // [$10, $50)
        ("mid", 5000L, 20000L),      // [$50, $200)
        ("large", 20000L, 100000L)   // [$200, $1000)
      )).toDF("band", "lo_cents", "hi_cents")
      val ev = events(s, d).select(col("event_type"),
        cents(col("value")).as("v_cents"))
      rangeBandJoin(ev, "v_cents", bands, bucketCents = 1000L)
        .groupBy("band", "event_type")
        .agg(count(lit(1)).as("event_cnt"),
             sum(col("v_cents")).as("total_value_cents"))
        .orderBy("band", "event_type")
    },
    Some("""WITH bands(band, lo_cents, hi_cents) AS (
              VALUES ('micro', 0, 1000), ('small', 1000, 5000),
                     ('mid', 5000, 20000), ('large', 20000, 100000)),
            ev AS (
              SELECT event_type,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents
              FROM events)
            SELECT band, event_type, count(*) AS event_cnt,
                   CAST(SUM(v_cents) AS BIGINT) AS total_value_cents
            FROM ev JOIN bands
              ON v_cents >= lo_cents AND v_cents < hi_cents
            GROUP BY band, event_type
            ORDER BY band, event_type""")
  )

  val all: Seq[QuerySpec] = Seq(asofAttribution, rangeBand)
}
