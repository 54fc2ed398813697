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
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY ts, tag, p_id ASC NULLS FIRST
                           ROWS UNBOUNDED PRECEDING))
            SELECT event_id, user_id, event_type,
                   COALESCE(a_id, -1) AS purchase_id,
                   CASE WHEN a_id IS NULL THEN -1
                        ELSE epoch_ns(ts) // 1000 - epoch_ns(a_ts) // 1000
                   END AS lag_us
            FROM c WHERE tag = 1 ORDER BY event_id""")
  )

  val all: Seq[QuerySpec] = Seq(asofAttribution)
}
