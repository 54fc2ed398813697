package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities the 100 TB deployment leans on — none of which the
  * reference needs at 30k rows, all of which its workload shape hits at
  * cluster scale (SURVEY §4: "AQE handles skew/join-strategy at
  * runtime" covers sort-merge joins; these cover the rest).
  */
object Scale {

  /** Salted inner equi-join for skewed build keys (the classic hot-key
    * fix when AQE's skew-join split doesn't apply, e.g. broadcast-
    * ineligible dimension with one country holding half the facts):
    * the big side gets a uniform per-row salt, the small side is
    * replicated once per salt, and the join key becomes (key, salt) —
    * the hot key's rows now land on `salts` different reducers.
    *
    * The salt is a content-derived hash over the row (the
    * salted_skew_join rule — no rand(), no monotonically_increasing_id),
    * so task retries and replays route every row identically: a
    * nondeterministic salt is inner-join-correct but makes straggler
    * re-execution reshuffle rows onto different reducers mid-job.
    * Uniformity caveat: rows identical in EVERY column share a salt —
    * dedup before salting if the hot key's rows are literal duplicates.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(salts)).cast("long"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Approximate distinct count (HyperLogLog++): the 100 TB stand-in for
    * the exact COUNT(DISTINCT) the oracle checks at small SF (SURVEY
    * §2.4 A6). rsd = relative standard deviation. */
  def approxDistinct(c: Column, rsd: Double = 0.02): Column =
    approx_count_distinct(c, rsd)

  /** Approximate percentiles via the t-digest-style sketch — the scale
    * path for median/p95 latency-style questions the reference's MySQL
    * layer could never answer without a full sort. */
  def approxPercentiles(c: Column, percentiles: Seq[Double],
                        accuracy: Int = 10000): Column =
    percentile_approx(c,
      array(percentiles.map(lit): _*), lit(accuracy))

  /** Frequent items (count-min-style): top heavy-hitters per column
    * without a full group-by — `df.stat.freqItems` wrapper with the
    * support threshold made explicit. */
  def frequentItems(df: DataFrame, cols: Seq[String],
                    support: Double = 0.01): DataFrame =
    df.stat.freqItems(cols.toArray, support)
}
