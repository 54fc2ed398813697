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

  test("scd2_asof: band boundaries are from-inclusive to-exclusive, inserts appear on time") {
    val got = Etl.scd2AsOf.fn(spark, sf).collect()
    val byProbe = got.groupBy(_.getAs[java.sql.Date]("as_of").toString)
    val nCust = graft.Tables.customer(spark, sf).count()
    // before any change: every existing key at version 1, inserts absent
    assert(byProbe("2020-06-01").length == nCust)
    assert(byProbe("2020-06-01").forall(_.getAs[Long]("version") == 1L))
    // last day of version 1: still version 1 everywhere (to-exclusive)
    assert(byProbe("2024-06-30").forall(_.getAs[Long]("version") == 1L))
    // the EXACT version-2 start date already resolves to version 2
    // (from-inclusive) and the inserts are now present
    val atFlip = byProbe("2024-07-01")
    assert(atFlip.exists(_.getAs[Long]("version") == 2L))
    assert(atFlip.length > nCust, "inserted keys missing at their valid_from")
    assert(atFlip.map(_.getAs[Long]("key")).distinct.length == atFlip.length,
      "a key resolved to TWO versions at one date — bands overlap")
    // open current band: same resolution as any later date
    assert(byProbe("2025-01-01").map(r =>
      (r.getAs[Long]("key"), r.getAs[Long]("version"))).toSet ==
      atFlip.map(r => (r.getAs[Long]("key"), r.getAs[Long]("version"))).toSet)
  }

  test("zorder_layout: every row lands in exactly one file, both dims cluster") {
    val files = Etl.zorderLayout.fn(spark, sf).collect()
    val base = graft.Tables.lineitem(spark, sf)
    // partition of the corpus: file row counts sum to the table size
    assert(files.map(_.getAs[Long]("n_rows")).sum == base.count())
    assert(files.length <= 16)
    // the z-order property: each file's span of EITHER key is at most
    // a quarter of the global span (a one-key sort would give perfect
    // pk clustering and no sk clustering; the bit-aligned top-4-bit
    // cells fix the top 2 NORMALIZED bits of each dim, so a file
    // covers ≤ 1/4 of both ranges, +2 for integer-div rounding)
    def widths(lo: String, hi: String) =
      files.map(r => r.getAs[Long](hi) - r.getAs[Long](lo))
    val pkGlobal = base.agg(
      max(col("l_partkey")).cast("long") - min(col("l_partkey")).cast("long"))
      .first().getLong(0)
    val skGlobal = base.agg(
      max(col("l_suppkey")).cast("long") - min(col("l_suppkey")).cast("long"))
      .first().getLong(0)
    // bound: a file fixes the top 2 normalized bits → width ≤
    // range·16384/65535 = range/4 + range/262140, +2 integer-div slack
    // (the second term matters once the key range exceeds ~260k)
    assert(widths("pk_min", "pk_max").max <= pkGlobal / 4 + pkGlobal / 262140 + 2,
      s"pk not clustered: ${widths("pk_min", "pk_max").toSeq} vs global $pkGlobal")
    assert(widths("sk_min", "sk_max").max <= skGlobal / 4 + skGlobal / 262140 + 2,
      s"sk not clustered: ${widths("sk_min", "sk_max").toSeq} vs global $skGlobal")
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
