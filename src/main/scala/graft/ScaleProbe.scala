package graft

import org.apache.spark.sql.functions._

/** Scaling-trajectory evidence for the dedup pipeline: replicate the
  * corpus k× (doc_ids offset per replica, so replicas are exact near-dup
  * groups) and time candidate generation end-to-end at each k. A
  * bucketed pipeline should grow near-linearly in corpus size; an
  * all-pairs shape would grow quadratically — this prints the curve
  * instead of asserting it rhetorically.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ScaleProbe 1 2 4 8"
  */
object ScaleProbe {

  /** `runMain graft.ScaleProbe pack [rowCounts...]`: the sequence_pack
    * prefix-sum strategy head-to-head — naive global window (every row
    * through ONE reducer) vs the shipped two-level scan (per-chunk
    * totals → tiny global window → partitioned intra-chunk window) — on
    * synthetic volume where the single-reducer sort actually hurts.
    * Same values both ways (asserted), different machines required. */
  private def packProbe(spark: org.apache.spark.sql.SparkSession,
      ns: Seq[Long]): Unit = {
    import org.apache.spark.sql.expressions.Window
    val runs = ns.map { n =>
      val toks = spark.range(n).select(col("id").as("doc_id"),
        (col("id") % 977 + 10).as("n_tokens"),
        expr("id div 10000").as("chunk"))
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      val (naiveSec, naiveSum) = time {
        val w = Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        toks.select(coalesce(sum(col("n_tokens")).over(w), lit(0L))
          .as("p")).agg(sum(col("p"))).as("s").first().getLong(0)
      }
      val (twoSec, twoSum) = time {
        val chunkTotals = toks.groupBy("chunk")
          .agg(sum(col("n_tokens")).as("ct"))
        val wc = Window.orderBy("chunk")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = chunkTotals.withColumn("off",
          coalesce(sum(col("ct")).over(wc), lit(0L))).select("chunk", "off")
        val wi = Window.partitionBy("chunk").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        toks.join(broadcast(offsets), "chunk")
          .select((col("off") + coalesce(sum(col("n_tokens")).over(wi),
            lit(0L))).as("p"))
          .agg(sum(col("p"))).first().getLong(0)
      }
      assert(naiveSum == twoSum, s"strategy mismatch: $naiveSum vs $twoSum")
      Harness.sweepBlocks(spark)
      println(f"[probe] n=$n%-9d naive_window=${naiveSec}%6.1f s   two_level=${twoSec}%6.1f s")
      (n, naiveSec, twoSec)
    }
    val qs = runs.map { case (n, a, b) =>
      s"""{"n":$n,"naive_sec":$a,"two_level_sec":$b}""" }
      .mkString("[", ",", "]")
    println(s"""{"probe":"prefix_sum_strategy","runs":$qs}""")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    if (args.headOption.contains("pack")) {
      val spark = Harness.session()
      val ns = if (args.length > 1) args.drop(1).toSeq.map(_.toLong)
               else Seq(1000000L, 10000000L, 50000000L)
      packProbe(spark, ns)
      spark.stop()
      return
    }
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 4, 8)
    val spark = Harness.session()
    val docs0 = Tables.documents(spark, sfDir).select("doc_id", "text")
    val base = docs0.count()
    val results = ks.map { k =>
      val docs = (0 until k).map(i =>
          docs0.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
            col("text")))
        .reduce(_ unionByName _)
      val t0 = System.nanoTime()
      val pairs = llm.Dedup.candidatePairsOf(docs).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Harness.sweepBlocks(spark)
      println(f"[probe] k=$k%-2d docs=${k * base}%-7d pairs=$pairs%-9d ${secs}%.1f s")
      (k, secs, pairs)
    }
    val qs = results.map { case (k, s, p) =>
      s"""{"k":$k,"sec":$s,"pairs":$p}""" }.mkString("[", ",", "]")
    println(s"""{"probe":"minhash_candidate_pairs","sf":"$sfDir","runs":$qs}""")
    spark.stop()
  }
}
