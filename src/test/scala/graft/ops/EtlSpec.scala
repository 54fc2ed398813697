package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the warehouse-maintenance family beyond the oracle's
  * value compare: SCD2 version chains must be internally consistent, the
  * upsert must be idempotent on keys, and salting must be invisible in
  * the results. */
class EtlSpec extends SparkSpec {

  test("scd2_build: exactly one current version per key, chains well-formed") {
    val out = Etl.scd2Build.fn(spark, sf).cache()
    try {
      val perKey = out.groupBy("key").agg(
        sum(when(col("is_current") === 1, 1L).otherwise(0L)).as("n_cur"),
        count(lit(1)).as("n_ver"),
        max(col("version")).as("max_ver"))
      // one open version per key; versions are 1..n with no gaps
      assert(perKey.filter(col("n_cur") =!= 1).isEmpty)
      assert(perKey.filter(col("max_ver") =!= col("n_ver")).isEmpty)
      // closed rows must carry a valid_to; open rows must not
      assert(out.filter(col("is_current") === 0 &&
        col("valid_to").isNull).isEmpty)
      assert(out.filter(col("is_current") === 1 &&
        col("valid_to").isNotNull).isEmpty)
    } finally out.unpersist()
  }

  test("incremental_upsert: one row per key, delta wins where present") {
    val out = Etl.incrementalUpsert.fn(spark, sf).cache()
    try {
      assert(out.groupBy("key").count().filter(col("count") =!= 1).isEmpty)
      // every key%5 survivor took the src=2 delta row; base keys are
      // <= max(o_orderkey) — insert keys live strictly above it now
      // that the offset is derived from max(key), not a constant
      val maxBase = graft.Tables.orders(spark, sf)
        .agg(max(col("o_orderkey"))).first().getLong(0)
      assert(out.filter(col("key") % 5 === 0 && col("key") <= maxBase &&
        col("src") =!= 2).isEmpty)
    } finally out.unpersist()
  }

  test("salted_skew_join equals the unsalted plain join") {
    import graft.Tables._
    val skewKey = when(col("l_partkey") % 4 === 0, lit(1L))
      .otherwise(col("l_partkey"))
    val plain = lineitem(spark, sf)
      .select(skewKey.as("skew_key"),
        cents(col("l_extendedprice")).as("price_cents"))
      .join(part(spark, sf).select(col("p_partkey").as("skew_key"),
        col("p_brand")), "skew_key")
      .groupBy("p_brand")
      .agg(sum(col("price_cents")).as("revenue_cents"),
        count(lit(1)).as("line_cnt"),
        count_distinct(col("skew_key")).as("n_parts"))
    val salted = Etl.saltedSkewJoin.fn(spark, sf)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("cube_totals covers all four grouping sets") {
    val out = Etl.cubeTotals.fn(spark, sf).cache()
    try {
      assert(out.filter(col("segment_g") === "ALL" &&
        col("year_g") === "ALL").count() == 1)
      assert(out.filter(col("segment_g") === "ALL" &&
        col("year_g") =!= "ALL").count() > 0)
      assert(out.filter(col("segment_g") =!= "ALL" &&
        col("year_g") === "ALL").count() > 0)
    } finally out.unpersist()
  }
}
