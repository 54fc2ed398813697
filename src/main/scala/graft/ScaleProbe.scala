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
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
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
