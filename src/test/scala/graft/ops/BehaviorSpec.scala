package graft.ops

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic checks for the round-10 behavioral/sampling keys. The oracle
  * gate proves Spark==DuckDB; these prove the SEMANTICS independently
  * (naive-plan recomputation, invariants, the loud cap, falsifiability of
  * the sketch flags). */
class BehaviorSpec extends SparkSpec {

  test("cohort_retention: matches the naive two-shuffle join plan") {
    val got = SparkEntry.queries("cohort_retention")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val om = Tables.orders(spark, sf).select(col("o_custkey"),
      date_trunc("month", col("o_orderdate")).as("om"))
    val first = om.groupBy("o_custkey").agg(min(col("om")).as("cohort"))
    val naive = om.join(first, "o_custkey")
      .groupBy(date_format(col("cohort"), "yyyy-MM").as("cm"),
        months_between(col("om"), col("cohort")).cast("long").as("ms"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == naive)
    // month-0 row exists for every cohort and is its largest month
    val byCohort = got.groupBy(_._1._1)
    byCohort.foreach { case (cm, rows) =>
      val m0 = rows.collectFirst { case ((_, 0L), n) => n }
      assert(m0.nonEmpty, s"cohort $cm has no month-0 row")
      assert(rows.values.forall(_ <= m0.get), cm)
    }
  }

  test("basket_affinity: pair counts match the self-join plan, lift recomputes") {
    val rows = SparkEntry.queries("basket_affinity")(spark, sf).collect()
    assert(rows.nonEmpty)
    val op = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val selfJoin = op.as("a").join(op.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val got = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == selfJoin)
    // lift recomputes from raw supports in exact integer math
    val support = op.groupBy("l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tot = op.select(countDistinct(col("l_orderkey"))).first().getLong(0)
    rows.foreach { r =>
      val want = (BigInt(r.getLong(2)) * tot * 1000000 /
        (BigInt(support(r.getLong(0))) * support(r.getLong(1)))).toLong
      assert(r.getLong(3) == want, r)
    }
  }

  test("basket_affinity: an oversized basket fails loudly, not quadratically") {
    import spark.implicits._
    val big = (1L to 40L).map(p => (1L, p)) :+ ((2L, 1L))
    val op = big.toDF("l_orderkey", "l_partkey")
    val e = intercept[Exception] {
      Behavior.basketPairsOf(op, cap = 32).collect()
    }
    assert(e.getMessage.contains("basket cap") ||
      Option(e.getCause).exists(_.getMessage.contains("basket cap")), e)
    // under the cap the same frame fans out fine
    assert(Behavior.basketPairsOf(op, cap = 64).count() == 40L * 39 / 2)
  }

  test("markov_transitions: per-user bigram conservation and ppm closure") {
    val rows = SparkEntry.queries("markov_transitions")(spark, sf).collect()
    assert(rows.nonEmpty)
    // same attributability scope as the query (NULL user/ts/type rows
    // carry no bigram) — recomputing over the raw table would make the
    // conservation identity fixture-dependent
    val ev = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
    val totalTransitions = rows.map(_.getLong(2)).sum
    val nEvents = ev.count()
    val nUsers = ev.select(countDistinct(col("user_id"))).first().getLong(0)
    assert(totalTransitions == nEvents - nUsers,
      s"$totalTransitions != $nEvents - $nUsers")
    // per-src floor-division closure: sum of ppm in (1e6 - |dst|, 1e6]
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val s = rs.map(_.getLong(3)).sum
      assert(s <= 1000000L && s > 1000000L - rs.length, s"$src: $s")
    }
  }

  test("heavy_hitters: flags hold, threshold bites, sketch compresses") {
    val rows = SparkEntry.queries("heavy_hitters")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("found"), r)
      assert(r.getAs[Boolean]("bound_ok"), r)
    }
    // mirror the query's NULL-value scope, or n and the witness counts
    // drift from the query's domain on a NULL-bearing corpus
    val items = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(floor(col("value")).cast("long").as("item"))
    val distinctItems =
      items.select(countDistinct(col("item"))).first().getLong(0)
    // the threshold must exclude most of the domain (heavy hitters are
    // a strict minority) and the per-partition budget must be smaller
    // than the domain (the summary genuinely compresses)
    assert(rows.length * 4 < distinctItems, s"${rows.length}/$distinctItems")
    assert(64 < distinctItems)
    // exact witness: every reported item really exceeds N/k
    val n = items.count()
    val exact = items.groupBy("item").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r =>
      assert(exact(r.getLong(0)) * 64 > n, r))
    assert(exact.count { case (_, c) => c * 64 > n } == rows.length)
  }

  test("rfm_segmentation: bands are balanced quartiles, metrics recompute") {
    val rows = SparkEntry.queries("rfm_segmentation")(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    // each band partitions the customers 1..4 with ntile balance
    for (bandCol <- Seq("r_band", "f_band", "m_band")) {
      val sizes = rows.groupBy(_.getAs[Long](bandCol)).view
        .mapValues(_.length).toMap
      assert(sizes.keySet == Set(1L, 2L, 3L, 4L), s"$bandCol: $sizes")
      assert(sizes.values.max - sizes.values.min <= 1, s"$bandCol: $sizes")
    }
    // band order agrees with metric order: sort by (metric, custkey)
    // must yield non-decreasing bands
    def mono(metric: String, band: String): Unit = {
      val sorted = rows.sortBy(r =>
        (r.getAs[Long](metric), r.getAs[Long]("o_custkey")))
      assert(sorted.sliding(2).forall(p =>
        p(0).getAs[Long](band) <= p(1).getAs[Long](band)), s"$metric/$band")
    }
    mono("r_days", "r_band"); mono("f_orders", "f_band")
    mono("m_cents", "m_band")
    // segment code composes the three digits; metrics recompute
    rows.foreach { r =>
      assert(r.getAs[Long]("segment") ==
        r.getAs[Long]("r_band") * 100 + r.getAs[Long]("f_band") * 10 +
          r.getAs[Long]("m_band"), r)
    }
    val om = Tables.orders(spark, sf).select(col("o_custkey"),
      col("o_orderdate"), Tables.cents(col("o_totalprice")).as("c"))
    assert(om.select(countDistinct(col("o_custkey"))).first().getLong(0)
      == n)
    val f = om.groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r =>
      assert(r.getAs[Long]("f_orders") == f(r.getAs[Long]("o_custkey")), r))
    // the most recent customer has r_days = 0 (anchor is the corpus max)
    assert(rows.map(_.getAs[Long]("r_days")).min == 0L)
  }

  test("changepoint_cusum: window closed-form equals the sequential CUSUM recurrence") {
    val rows = SparkEntry.queries("changepoint_cusum")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      val series = rs.sortBy(_.getAs[java.sql.Date]("day").toString)
      val daily = series.map(_.getAs[Long]("daily_milli"))
      val nd = daily.length.toLong
      val tot = daily.sum
      // sequential CUSUM: S_t = max(0, S_{t-1} + d_t), both directions
      var sPos = 0L
      var sNeg = 0L
      series.zip(daily).foreach { case (r, x) =>
        val d = nd * x - tot
        sPos = math.max(0L, sPos + d)
        sNeg = math.max(0L, sNeg - d)
        assert(r.getAs[Long]("drift_pos") == sPos, s"$tpe $r")
        assert(r.getAs[Long]("drift_neg") == sNeg, s"$tpe $r")
      }
      // mean-centering makes both drifts close at zero over the series
      assert(series.last.getAs[Long]("drift_pos") >= 0)
      // residuals sum to zero exactly: P_n == 0, so the last drifts are
      // -min(P) and max(P) — each hits 0 for a monotone-free series only;
      // at minimum one of the two statistics must have moved off zero
      assert(series.map(r => r.getAs[Long]("drift_pos")
        + r.getAs[Long]("drift_neg")).max > 0 || daily.distinct.length == 1)
    }
  }

  test("weighted_sample: fixed size, deterministic, weight-biased") {
    val q = SparkEntry.queries("weighted_sample")
    val a = q(spark, sf).collect()
    val b = q(spark, sf).collect()
    assert(a.length == 100)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // priority recomputes: floor(w * 2^33 / u) with u = md5-32(doc_id)+1
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"),
        (expr("conv(substring(md5(concat('ws-v1:', cast(doc_id as string))), 1, 8), 16, 10)")
          .cast("long") + 1L).as("u"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    a.foreach { r =>
      val (w, u) = docs(r.getLong(0))
      assert(r.getLong(1) == w)
      assert(r.getLong(2) == w * 8589934592L / u, r)
    }
    // the sample is exactly the global top-100 by (priority, doc_id)
    val top = docs.toSeq
      .map { case (id, (w, u)) => (w * 8589934592L / u, id) }
      .sortBy { case (p, id) => (-p, id) }.take(100).map(_._2).toSet
    assert(a.map(_.getLong(0)).toSet == top)
    // weight-proportional inclusion biases the sample heavy
    val sampleMean = a.map(_.getLong(1)).sum.toDouble / a.length
    val corpusMean = docs.values.map(_._1).sum.toDouble / docs.size
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean !> corpus mean $corpusMean")
  }
}
