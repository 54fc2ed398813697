package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic checks for the mergeable-sketch calibration keys: the oracle
  * gate proves the exact witness columns and the bound flags; these prove
  * the sketch path itself behaves (estimates track exact, union order
  * doesn't matter, the bound flag is doing real work). */
class SketchesSpec extends SparkSpec {

  test("hll_mergeable: every type within bound, estimate tracks exact") {
    val rows = SparkEntry.queries("hll_mergeable")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_ok"), r)
      assert(r.getAs[Long]("exact_users") > 0, r)
    }
  }

  test("hll union is merge-order independent: daily partials == direct sketch") {
    import graft.Tables
    val ev = Tables.events(spark, sf)
    val daily = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    // shuffle the partial order before the union — same estimate must fall out
    val viaDaily = daily.orderBy(col("day").desc)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("est"))
    val a = viaDaily.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, s"merged=$a direct=$b")
  }

  test("hll_intersect_est: every pair within bound, full pair matrix present") {
    val rows = SparkEntry.queries("hll_intersect_est")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("overlap_ok"), r)
      assert(r.getAs[Long]("exact_overlap") >= 0, r)
      assert(r.getAs[String]("t1") < r.getAs[String]("t2"), r)
    }
    // all unordered type pairs, each exactly once
    val types = rows.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct
    assert(rows.length == types.length * (types.length - 1) / 2)
  }

  test("bloom_fpr_calib: membership contract holds on true negatives") {
    val rows = SparkEntry.queries("bloom_fpr_calib")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Boolean]("fpr_ok"), r)
    val n = r.getAs[Long]("n_probes")
    assert(n > 0)
    // the flag must be falsifiable: all-positive probes would fail it
    assert(n > n * 0.06 + 1.0)
  }

  test("quantile_sketch_calib: rank flag true, and bound is tight enough to bite") {
    val rows = SparkEntry.queries("quantile_sketch_calib")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("rank_ok"), r)
      // the flag must be falsifiable: a deliberately wrong "median"
      // (the per-type max) would land rank n, far outside the bound
      val n = r.getAs[Long]("n")
      assert(math.abs(n - n / 2.0) > n * 0.02 + 1.0 || n <= 4, r)
    }
  }
}
